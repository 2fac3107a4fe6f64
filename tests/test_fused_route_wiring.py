"""Fused-composite CALL-SITE wiring vs the separate-pass pipeline (advisor
round-4 finding #2).

tests/test_composite_pallas.py validates warp_parts_composite_pallas with
its own independently chosen groups/erode/hand tuples; these tests instead
force the fused branch through the REAL route wiring (TUNING's interpret
hook executes the kernel on CPU) and assert every output of each
prepare-level entry point equals the separate-pass path — so a wrong erode
tuple, group assignment, or output-assembly slip in any route_patches_*
fused branch is caught in CPU CI, not on first TPU use.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pasta_gan_tpu.data.dataset import (
    SyntheticUvitonDataset,
    collate,
    prepare_tryon_batch,
    prepare_tryon_batch_512,
    prepare_tryon_batch_v18,
)
from pasta_gan_tpu.ops.tuning import TUNING, tuned


def _pair(B=2):
    ds = SyntheticUvitonDataset(num_samples=B + 1)
    person = {k: jnp.asarray(v) for k, v in collate([ds[i] for i in range(B)]).items()}
    garment = {k: jnp.asarray(v) for k, v in collate([ds[i + 1] for i in range(B)]).items()}
    return person, garment


def _compare(prep, *args, **kw):
    import jax

    with tuned(composite_interpret=False):
        jax.clear_caches()
        ref = prep(*args, **kw)
    with tuned(composite_interpret=True, fused_composite=True):
        jax.clear_caches()
        fused = prep(*args, **kw)
    jax.clear_caches()
    assert set(ref) == set(fused)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(fused[k]), np.asarray(ref[k]), atol=5e-5,
            err_msg=f"output {k!r} diverges between fused and separate paths",
        )


@pytest.mark.slow
def test_route_single_fused_wiring():
    person, garment = _pair()
    _compare(prepare_tryon_batch, person, garment)


@pytest.mark.slow
def test_route_v19_fused_wiring():
    person, garment = _pair()
    _compare(prepare_tryon_batch_v18, person, garment)


@pytest.mark.slow
def test_route_512_fused_wiring():
    person, garment = _pair(B=1)
    _compare(
        prepare_tryon_batch_512, person, garment,
        change_region="fullbody", pad_x=float(person["left_padding"][0]),
    )


def test_vmem_budget_gate_falls_back():
    """Routes whose N-part source residency exceeds the VMEM budget must
    take the separate-pass pipeline, not launch the fused kernel."""
    from pasta_gan_tpu.data.warp import _use_fused_composite

    with tuned(composite_interpret=True, fused_composite=True):
        assert _use_fused_composite(14, 4, 64, 64)  # 256 route: 7.3 MB
        assert _use_fused_composite(15, 4, 128, 128)  # 512 route: 15.7 MB
        assert not _use_fused_composite(60, 4, 128, 128)  # 63 MB: reject
    assert not _use_fused_composite(14, 4, 64, 64)  # CPU, no hook: oracle path
