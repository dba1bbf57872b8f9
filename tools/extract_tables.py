#!/usr/bin/env python3
"""Extract numeric coefficient tables from the r8brain-free-src reference
headers into a generated Python data module.

The tables are *data* (filter taps and empirical correction constants
produced offline by the reference's design tools other/hbopt.cpp,
other/winopt.cpp and other/calcCorrTable.cpp).  The code that consumes them
in this repo is an independent TPU-native implementation; only the constants
are carried over, with provenance recorded.

Usage: python tools/extract_tables.py /root/reference r8brain_tpu/design/_tables.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path


def parse_c_array(text: str, name: str):
    """Parse `static const <type> NAME[...] = { ... };` into a list of floats."""
    m = re.search(
        r"static\s+const\s+[\w ]+\s+" + re.escape(name) + r"\s*\[[^\]]*\]\s*=\s*\{(.*?)\};",
        text,
        re.S,
    )
    if not m:
        raise KeyError(f"array {name} not found")
    body = m.group(1)
    body = re.sub(r"//[^\n]*", "", body)
    vals = [v.strip() for v in body.replace("\n", " ").split(",")]
    return [float(v) for v in vals if v]


def parse_2d_array(text: str, name: str):
    """Parse `static const double NAME[N][3] = { {..}, .. };` rows."""
    m = re.search(
        r"static\s+const\s+double\s+" + re.escape(name)
        + r"\s*\[[^\]]*\]\[\s*3\s*\]\s*=\s*\{(.*?)\};",
        text,
        re.S,
    )
    if not m:
        raise KeyError(f"2d array {name} not found")
    body = re.sub(r"//[^\n]*", "", m.group(1))
    rows = re.findall(r"\{([^}]*)\}", body)
    out = []
    for r in rows:
        vals = [float(v.strip()) for v in r.split(",") if v.strip()]
        out.append(tuple(vals))
    return out


def fmt_list(vals, per_line=6, indent="    "):
    lines = []
    for i in range(0, len(vals), per_line):
        chunk = ", ".join(repr(v) for v in vals[i : i + per_line])
        lines.append(indent + chunk + ",")
    return "\n".join(lines)


def main(ref_dir: str, out_path: str):
    ref = Path(ref_dir)
    fir_h = (ref / "CDSPFIRFilter.h").read_text()
    hbu_h = (ref / "CDSPHBUpsampler.h").read_text()
    frac_h = (ref / "CDSPFracInterpolator.h").read_text()

    out = []
    out.append('"""Generated data tables — do not edit by hand.')
    out.append("")
    out.append("Extracted by tools/extract_tables.py from the r8brain-free-src")
    out.append("reference headers (data constants produced by its offline design")
    out.append("tools other/hbopt.cpp, other/winopt.cpp, other/calcCorrTable.cpp):")
    out.append("  * ATTEN_CORRS_*   — CDSPFIRFilter.h:294-371")
    out.append("  * HB kernels      — CDSPHBUpsampler.h:47-316 (half-band),")
    out.append("                      CDSPHBUpsampler.h:331-552 (one-third band)")
    out.append("  * FRAC_COEFFS_*   — CDSPFracInterpolator.h:282-312")
    out.append('"""')
    out.append("")

    # --- Attenuation correction tables (CDSPFIRFilter.h buildLPFilter) ------
    # There are three `AttenCorrs` arrays in tb>=0.25, tb>=0.10 and else
    # branches with scales 101.0, 210.0, 196.0.
    atten_blocks = re.findall(
        r"static\s+const\s+double\s+AttenCorrScale\s*=\s*([\d.]+)\s*;\s*"
        r"static\s+const\s+signed\s+char\s+AttenCorrs\[\]\s*=\s*\{(.*?)\};",
        fir_h,
        re.S,
    )
    assert len(atten_blocks) == 3, len(atten_blocks)
    names = ["ATTEN_CORRS_TB25", "ATTEN_CORRS_TB10", "ATTEN_CORRS_TB00"]
    scales = []
    for (scale, body), name in zip(atten_blocks, names):
        vals = [int(v.strip()) for v in re.sub(r"//[^\n]*", "", body).replace("\n", " ").split(",") if v.strip()]
        # Index range is [0, AttenCorrCount] inclusive (CDSPFIRFilter.h:281-284),
        # hence 265 entries.
        assert len(vals) == 265, (name, len(vals))
        scales.append(float(scale))
        out.append(f"{name} = (  # scale {scale}")
        out.append(fmt_list(vals, per_line=14))
        out.append(")")
        out.append("")
    out.append(f"ATTEN_CORR_SCALES = ({scales[0]!r}, {scales[1]!r}, {scales[2]!r})")
    out.append("")

    # --- Half-band kernels ---------------------------------------------------
    # Two functions: getHBFilter (classes A..G) and getHBFilterThird.
    def extract_hb(fn_src: str, tag: str):
        res = {}
        for cls in "ABCDEFG":
            attens = parse_c_array(fn_src, f"FltAttens{cls}")
            base_m = re.search(r"FlttBase" + cls + r"\s*=\s*(\d+)", fn_src)
            base = int(base_m.group(1))
            kernels = []
            for k in range(len(attens)):
                taps = base + k
                kernels.append(parse_c_array(fn_src, f"HBKernel_{taps}{cls}"))
            res[cls] = (base, attens, kernels)
        return res

    # Split the header into the two function bodies.
    i1 = hbu_h.index("getHBFilter(")
    i2 = hbu_h.index("getHBFilterThird(")
    i3 = hbu_h.index("CDSPHBUpsampler( const double ReqAtten")
    hb_main = hbu_h[i1:i2]
    hb_third = hbu_h[i2:i3]

    for tag, src in (("HB", hb_main), ("HB3", hb_third)):
        data = extract_hb(src, tag)
        out.append(f"{tag}_TABLES = {{")
        for ci, cls in enumerate("ABCDEFG"):
            base, attens, kernels = data[cls]
            out.append(f"    {ci}: (  # class {cls}, steepness index {ci}")
            out.append(f"        {tuple(attens)!r},")
            out.append("        (")
            for kern in kernels:
                out.append("            " + repr(tuple(kern)) + ",")
            out.append("        ),")
            out.append("    ),")
        out.append("}")
        out.append("")

    # --- Fractional-bank Kaiser parameter tables ----------------------------
    c2 = parse_2d_array(frac_h, "Coeffs2")
    c3 = parse_2d_array(frac_h, "Coeffs3")
    out.append("# (beta, power, attenuation) rows; filter length = base + 2*i")
    out.append("FRAC_COEFFS2_BASE = 8")
    out.append("FRAC_COEFFS2 = (")
    for row in c2:
        out.append(f"    {row!r},")
    out.append(")")
    out.append("")
    out.append("FRAC_COEFFS3_BASE = 6")
    out.append("FRAC_COEFFS3 = (")
    for row in c3:
        out.append(f"    {row!r},")
    out.append(")")
    out.append("")

    Path(out_path).write_text("\n".join(out))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
