"""Worker process for tests/test_distributed.py (2-process DCN stand-in).

Each process owns 2 virtual CPU devices and one row of the ("ch", "t")
mesh; the time axis spans both of each process's devices, the channel
axis spans processes — so halo ppermutes cross the process boundary
through the Gloo collective backend exactly where DCN traffic would flow
on a multi-host pod.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid,
                               local_device_ids=[0, 1])
    try:  # pre-0.9 jax required this for eager ops on global arrays
        jax.config.update("jax_spmd_mode", "allow_all")
    except AttributeError:
        pass
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from r8brain_tpu.models.resampler import Resampler
    from r8brain_tpu.parallel.sharding import ShardedResampler

    assert jax.process_count() == 2
    assert len(jax.devices()) == 4
    # procs on 'ch': channel shards never cross processes (DP-like);
    # 't' spans devices within a process.  ALSO run a transposed mesh so
    # time-halo ppermutes cross the process boundary (the DCN path).
    for axes_order, tag in ((("ch", "t"), "t-intra"), (("t", "ch"),
                                                       "t-inter")):
        devs = np.array(jax.devices()).reshape(2, 2)
        mesh = Mesh(devs, axes_order)
        rs = Resampler(44100, 96000, 2.0, 160.0, 0, dtype=jnp.float32)
        srs = ShardedResampler(rs, mesh)
        C, n = 4, 20000
        rng = np.random.default_rng(0)
        x_full = rng.standard_normal((C, n)).astype(np.float32)
        out_len = rs.default_out_len(n)
        M_s, L_s, H, W, R = srs._geometry(out_len, n)
        T = srs.n_t * L_s
        xp = np.zeros((C, T), dtype=np.float32)
        xp[:, :n] = x_full
        sharding = NamedSharding(mesh, P("ch", "t"))
        xg = jax.make_array_from_callback((C, T), sharding,
                                          lambda idx: xp[idx])
        y = srs.oneshot(xg, out_len)
        ref = np.asarray(rs.oneshot(x_full, out_len), dtype=np.float64)
        worst = -1e9
        n_shards = 0
        for sh in y.addressable_shards:
            got = np.asarray(jax.device_get(sh.data), dtype=np.float64)
            exp = ref[tuple(sh.index)]
            m = min(got.shape[1], exp.shape[1])
            d = got[:, :m] - exp[:, :m]
            worst = max(worst, 10 * np.log10(np.mean(d * d) + 1e-300))
            n_shards += 1
        assert n_shards > 0
        assert worst < -120.0, f"{tag}: {worst:.1f} dB"
        print(f"proc {pid} {tag} worst-shard {worst:.1f} dB", flush=True)
    print(f"proc {pid} PASS", flush=True)


if __name__ == "__main__":
    main()
