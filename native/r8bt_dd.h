/* r8bt_dd.h — deterministic double-double (df64) cepstral min-phase
 * transform, the native mirror of r8brain_tpu/design/dd.py +
 * design/ddfft.py + design/minphase.py::_min_phase_dd.
 *
 * Purpose: on ABIs where long double is plain binary64 (MSVC x64, some
 * ARM EABIs) the extended-precision path of minPhaseTransform
 * (r8bt_design.cpp) degenerates to f64 and high-atten min-phase designs
 * skew at random (the reference's own documented limit,
 * CDSPFIRFilter.h:40-46).  This unit evaluates the whole transform in
 * double-double built from IEEE-754 binary64 primitives only — every
 * operation sequence matches the Python implementation bit-for-bit, so
 * designs are reproducible across PLATFORMS and across the two
 * DESIGNERS (pinned in tests/test_minphase_dd.py).
 *
 * MUST be compiled with FP contraction disabled (-ffp-contract=off; see
 * native/Makefile): the cross-product sums inside dd multiplication
 * would otherwise fuse into FMAs that numpy does not perform.  The one
 * deliberate std::fma (two_prod's error term) is exact and equals the
 * Dekker-split value the Python side computes.
 */

#ifndef R8BT_DD_H
#define R8BT_DD_H

#include <cstddef>
#include <vector>

namespace r8bt_dd {

/* Minimum-phase transform of `kernel` (odd-length linear-phase
 * windowed-sinc), frequency oversampling `lenMult`; returns the
 * min-phase kernel (same length).  Mirrors design/minphase.py's
 * _min_phase_dd step for step. */
std::vector<double> minPhaseTransformDD(const std::vector<double> &kernel,
                                        int lenMult);

} // namespace r8bt_dd

#endif /* R8BT_DD_H */
