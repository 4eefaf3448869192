"""Single source of truth for the GroupNorm statistics-formulation default.

"two_pass" is the classical centered variance (two sequential HBM reads of
x per norm); "one_pass" computes mean and E[x^2] in one fused pass (see
ops/norm.py and docs/ARCHITECTURE.md "Analytic HBM decomposition").

The default stays "two_pass" until the hardware A/B
(tools/run_norm_stats_ab.py) measures a clean one_pass win at b8 AND b128,
at which point tools/flip_norm_stats_default.py rewrites this file (it is
the only place the default lives) and commits with the measured numbers.
"""

DEFAULT_NORM_STATS = "one_pass"
