"""Native C++ engine (native/r8bt.cpp via ctypes) vs the CPU oracle.

The native engine is the deployment host runtime (the reference's DLL
analog, DLL/r8bsrc.h); it must execute the planned chain sample-exactly.
Skipped when no C++ toolchain is available.
"""

import os
import shutil

import numpy as np
import pytest

from .helpers import lcg_uniform, rms_db

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def native():
    from r8brain_tpu.native import NativeResampler, build_library

    build_library()
    return NativeResampler


CONFIGS = [
    ("up_44k_96k", 44100, 96000, 180.15),
    ("down_96k_44k", 96000, 44100, 180.15),
    ("up_44k_48k", 44100, 48000, 140.0),
    ("poly_96001", 44100, 96001, 160.0),
    ("x4_up", 44100, 176400, 140.0),
    ("x4_down", 176400, 44100, 140.0),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_native_matches_oracle(native, cfg):
    label, src, dst, atten = cfg
    from r8brain_tpu.models.oracle import OracleResampler

    nr = native(src, dst, 2.0, atten, 0)
    orc = OracleResampler(src, dst, 4096, 2.0, atten, 0, plan=nr.plan)
    n = 8000
    x = lcg_uniform(3, n)
    out_len = int(np.floor(n * dst / src))
    y = nr.oneshot(x, out_len)
    ref = orc.oneshot(x, out_len)
    assert y.shape == ref.shape
    d = rms_db(y - ref)
    assert d < -280.0, f"{label}: {d:.1f} dB"
    for m in (1, 100, 1000):
        assert (nr.get_input_required_for_output(m)
                == orc.get_input_required_for_output(m))
    assert abs(nr.latency_frac - orc.latency_frac) < 1e-12


def test_native_streaming_chunks(native):
    from r8brain_tpu.models.oracle import OracleResampler

    nr = native(44100, 96000, 2.0, 140.0, 0)
    orc = OracleResampler(44100, 96000, 4096, 2.0, 140.0, 0, plan=nr.plan)
    x = lcg_uniform(9, 10000)
    rng = np.random.default_rng(0)
    pos = 0
    outs = []
    nr.clear()
    while pos < 10000:
        c = int(rng.integers(1, 700))
        outs.append(nr.process(x[pos : pos + c]))
        pos += c
    y = np.concatenate(outs)
    ref_parts = []
    pos = 0
    while pos < 10000:
        ref_parts.append(orc.process(x[pos : pos + 512]))
        pos += 512
    ref = np.concatenate(ref_parts)
    m = min(len(y), len(ref))
    assert m > 9000
    assert rms_db(y[:m] - ref[:m]) < -280.0


def test_native_fftcheck(native):
    """Direct unit check of the engine's Stockham FFT kernel: every
    power-of-two size 8..8192 (all radix plans incl. the odd-parity
    4*2 split and the tiny final-copy path) vs a naive f64 DFT, forward
    + unscaled inverse + round trip (the reference's FFT-backend
    interchangeability contract, r8bconf.h:149-206)."""
    import subprocess
    from pathlib import Path

    nat = Path(__file__).resolve().parent.parent / "native"
    r = subprocess.run(["make", "-C", str(nat), "fftcheck"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    r = subprocess.run([str(nat / "fftcheck")], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stdout
    assert "FFTCHECK PASS" in r.stdout


def test_native_masstest_asan(native, tmp_path):
    """Randomized streaming under AddressSanitizer+UBSan — the reference's
    Dr.Memory masstest methodology (bench/masstest.cpp:3-9)."""
    import subprocess
    from pathlib import Path

    from r8brain_tpu.models.plan import make_plan
    from r8brain_tpu.native import build_plan_blob

    nat = Path(__file__).resolve().parent.parent / "native"
    r = subprocess.run(["make", "-C", str(nat), "masstest_asan"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    for label, src, dst in (("a", 44100, 96000), ("b", 96000, 44100),
                            ("c", 44100, 96001)):
        blob = build_plan_blob(make_plan(src, dst, 2.0, 140.0, 0))
        p = tmp_path / f"{label}.blob"
        p.write_bytes(blob)
        # threads=2: one engine per thread — the reference's
        # one-object-per-channel concurrency contract (README.md:52-55)
        # under the sanitizers
        r = subprocess.run([str(nat / "masstest_asan"), str(p), "20000",
                            "42", "2"],
                           capture_output=True, text=True)
        assert r.returncode == 0, (label, r.stdout, r.stderr[-2000:])
        assert "checksum" in r.stdout
        assert "mrops_mt" in r.stdout


def test_native_hbdown_chunk_boundary(native):
    """Regression: C++ truncation-toward-zero in HBDownStage::availOut made
    the engine emit one output before its inputs existed when a chunk
    boundary landed at n_in = 2*nt - 1 (code-review finding)."""
    from r8brain_tpu.models.oracle import OracleResampler

    nr = native(176400, 44100, 2.0, 140.0, 0)
    orc = OracleResampler(176400, 44100, 4096, 2.0, 140.0, 0, plan=nr.plan)
    from r8brain_tpu.models.plan import HBDownStage

    nts = [s.hb.num_taps for s in nr.plan.stages
           if isinstance(s, HBDownStage)]
    assert nts, "plan must contain an hb_down stage"
    n = 20000
    x = lcg_uniform(4, n)
    for nt in nts:
        cut = 2 * nt - 1
        nr.clear()
        y = np.concatenate([nr.process(x[:cut]), nr.process(x[cut:])])
        ref = orc.oneshot(x, len(y))
        assert rms_db(y - ref[: len(y)]) < -280.0, (nt, cut)


@pytest.mark.slow
@pytest.mark.skipif(__import__("platform").machine() not in
                    ("x86_64", "AMD64"),
                    reason="-mno-avx512* flags are x86-only")
def test_native_avx2_paths_match_oracle(tmp_path):
    """ISA coverage: the 4-lane AVX2+FMA kernels (hosts without AVX-512)
    must be oracle-exact too.  Builds the AVX-512-masked library and
    re-runs the parity check through it in a subprocess (R8BT_LIB), so
    the default-build module cache is untouched."""
    import subprocess
    import sys
    from pathlib import Path

    nat = Path(__file__).resolve().parent.parent / "native"
    r = subprocess.run(["make", "-C", str(nat), "libr8bt_avx2.so"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    prog = (
        "import numpy as np\n"
        "from r8brain_tpu.native import NativeResampler\n"
        "from r8brain_tpu.models.oracle import OracleResampler\n"
        "from tests.helpers import lcg_uniform, rms_db\n"
        "for src, dst in ((44100, 96000), (96000, 44100),\n"
        "                 (44100, 96001), (2822400, 96000)):\n"
        "    nr = NativeResampler(src, dst, 2.0, 180.15, 0)\n"
        "    orc = OracleResampler(src, dst, 4096, 2.0, 180.15, 0,\n"
        "                          plan=nr.plan)\n"
        "    n = 8000 if src < 10**6 else 200000\n"
        "    x = lcg_uniform(3, n)\n"
        "    out_len = int(np.floor(n * dst / src))\n"
        "    d = rms_db(nr.oneshot(x, out_len) - orc.oneshot(x, out_len))\n"
        "    assert d < -280.0, (src, dst, d)\n"
        "print('AVX2 PARITY OK')\n"
    )
    env = dict(os.environ, R8BT_LIB=str(nat / "libr8bt_avx2.so"),
               JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                       text=True, env=env,
                       cwd=str(Path(__file__).resolve().parent.parent))
    assert r.returncode == 0, (r.stdout, r.stderr[-2000:])
    assert "AVX2 PARITY OK" in r.stdout


@pytest.mark.slow
def test_native_neon_emulated_paths_match_oracle(tmp_path):
    """NEON coverage (VERDICT r3 next #7): no ARM toolchain or network
    exists in this sandbox (zig cc unavailable), so the 2-lane R8BT_NEON
    kernels are validated by SEMANTICS — built against the scalar
    emulation stub (native/neon_stub/arm_neon.h) and run oracle-exact
    through the same parity sweep as the AVX2 ISA check.  aarch64 codegen
    remains unverified until an ARM build host exists (documented in
    native/r8bt.cpp)."""
    import subprocess
    import sys
    from pathlib import Path

    nat = Path(__file__).resolve().parent.parent / "native"
    r = subprocess.run(["make", "-C", str(nat), "libr8bt_neon_emu.so"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    prog = (
        "import numpy as np\n"
        "from r8brain_tpu.native import NativeResampler\n"
        "from r8brain_tpu.models.oracle import OracleResampler\n"
        "from tests.helpers import lcg_uniform, rms_db\n"
        "for src, dst in ((44100, 96000), (96000, 44100),\n"
        "                 (44100, 96001), (2822400, 96000)):\n"
        "    nr = NativeResampler(src, dst, 2.0, 180.15, 0)\n"
        "    orc = OracleResampler(src, dst, 4096, 2.0, 180.15, 0,\n"
        "                          plan=nr.plan)\n"
        "    n = 8000 if src < 10**6 else 200000\n"
        "    x = lcg_uniform(3, n)\n"
        "    out_len = int(np.floor(n * dst / src))\n"
        "    d = rms_db(nr.oneshot(x, out_len) - orc.oneshot(x, out_len))\n"
        "    assert d < -280.0, (src, dst, d)\n"
        "print('NEON EMU PARITY OK')\n"
    )
    env = dict(os.environ, R8BT_LIB=str(nat / "libr8bt_neon_emu.so"),
               JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                       text=True, env=env,
                       cwd=str(Path(__file__).resolve().parent.parent))
    assert r.returncode == 0, (r.stdout, r.stderr[-2000:])
    assert "NEON EMU PARITY OK" in r.stdout


def test_blob_rate_validation(native):
    """A plan blob designed for different rates (or garbage bytes) must be
    rejected at construction: oneshot()'s default out_len uses the
    constructor rates, so a mismatch would silently produce wrong-length
    output."""
    from r8brain_tpu.native import NativeResampler, native_design_blob

    blob = native_design_blob(96000.0, 44100.0, 2.0, 180.15, 0)
    with pytest.raises(ValueError, match="96000->44100"):
        NativeResampler(44100, 96000, blob=blob)
    with pytest.raises(ValueError, match="magic"):
        NativeResampler(1, 2, blob=b"XXXX" + bytes(40))
    # matching rates still construct and run
    r = NativeResampler(96000, 44100, blob=blob)
    assert r.oneshot(np.zeros(1000)).shape[0] > 0
