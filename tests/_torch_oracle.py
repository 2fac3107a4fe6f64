"""Load the reference implementation (read-only mount) as a parity oracle.

We import the reference's pure-PyTorch `_bias_act_ref` / `_upfirdn2d_ref` /
`modulated_conv2d` and compare our JAX ops against them.  This is test-only
usage of the mounted reference — no reference code is copied into this repo.
"""

import sys

REFERENCE_ROOT = "/root/reference"


def load_reference():
    """Returns (bias_act_mod, upfirdn2d_mod, conv2d_resample_mod) or None."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        from torch_utils.ops import bias_act as ref_bias_act  # noqa
        from torch_utils.ops import conv2d_resample as ref_conv2d_resample  # noqa
        from torch_utils.ops import upfirdn2d as ref_upfirdn2d  # noqa

        return ref_bias_act, ref_upfirdn2d, ref_conv2d_resample
    except Exception:  # pragma: no cover - reference not present in CI
        return None
