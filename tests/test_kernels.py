"""Pallas flash attention vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itsd_tpu.kernels.attention import (_attention_flash, _attention_xla,
                                        mha_attention, spatial_attention)


def test_flash_matches_xla_interpret(key):
    B, N, C = 2, 256, 128
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, N, C))
    k = jax.random.normal(k2, (B, N, C))
    v = jax.random.normal(k3, (B, N, C))
    scale = C ** -0.5
    want = _attention_xla(q, k, v, scale)
    got = _attention_flash(q, k, v, scale, block_q=128, block_k=128,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_spatial_attention_softmax_property(key):
    """Attention with v = ones must return ones (rows sum to 1)."""
    B, N, C = 1, 64, 8
    q = jax.random.normal(key, (B, N, C))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, N, C))
    v = jnp.ones((B, N, C))
    out = spatial_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.ones((B, N, C)),
                               rtol=1e-5)


@pytest.mark.slow
def test_mha_matches_per_head_single_head(key):
    B, N, H, D = 2, 16, 4, 8
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, N, H, D))
    k = jax.random.normal(ks[1], (B, N, H, D))
    v = jax.random.normal(ks[2], (B, N, H, D))
    got = mha_attention(q, k, v, impl="xla")
    from itsd_tpu.kernels.attention import _attention_xla as ax
    for h in range(H):
        want_h = ax(q[:, :, h], k[:, :, h], v[:, :, h], D ** -0.5)
        np.testing.assert_allclose(np.asarray(got[:, :, h]),
                                   np.asarray(want_h), rtol=1e-5, atol=1e-5)


class TestVmemBudgetBlockPick:
    """Scoped-VMEM-aware block selection: the fixed (512, 1024) backward
    blocks overflowed the 16 MB scoped-vmem stack at C=512 (observed
    18.84M compile failure at 256x256 ch=128 batch>=24 — docs/PERF.md);
    the chooser must shrink blocks exactly there and nowhere cheap."""

    def test_flagship_mid_block_fits_budget(self):
        from itsd_tpu.kernels.attention import (_dkv_vmem_estimate,
                                                _dq_vmem_estimate,
                                                _pick_block_pair,
                                                _vmem_budget_bytes)
        ests = (_dq_vmem_estimate, _dkv_vmem_estimate)
        # the failing shape: N=1024 tokens, C=512 (mid block at 256x256)
        bq, bk = _pick_block_pair(1024, 512, 2, ests)
        assert (bq, bk) != (512, 1024)
        assert max(e(bq, bk, 512, 2) for e in ests) <= _vmem_budget_bytes()
        # old fixed blocks really do exceed the budget (the bug)
        assert max(e(512, 1024, 512, 2) for e in ests) > _vmem_budget_bytes()

    def test_small_c_keeps_fast_blocks(self):
        from itsd_tpu.kernels.attention import (_fwd_vmem_estimate,
                                                _pick_block_pair)
        # C=128 forward: nothing to shrink — keep the measured optimum
        assert _pick_block_pair(4096, 128, 2, (_fwd_vmem_estimate,)) == \
            (512, 1024)

    def test_divisibility_and_fallback(self):
        from itsd_tpu.kernels.attention import (_fwd_vmem_estimate,
                                                _pick_block_pair)
        bq, bk = _pick_block_pair(768, 256, 2, (_fwd_vmem_estimate,))
        assert 768 % bq == 0 and 768 % bk == 0

    def test_explicit_blocks_still_honored(self, key):
        # flash_tune-style explicit overrides bypass the budget chooser
        k1, k2, k3 = jax.random.split(key, 3)
        q = jax.random.normal(k1, (2, 512, 128))
        k = jax.random.normal(k2, (2, 512, 128))
        v = jax.random.normal(k3, (2, 512, 128))
        out = _attention_flash(q, k, v, 128 ** -0.5, block_q=128,
                               block_k=256, interpret=True)
        ref = _attention_xla(q, k, v, 128 ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.slow
    def test_budgeted_bwd_matches_xla_grads(self, key):
        """End-to-end at the shape that TRIGGERS the shrink (N=1024,
        C=512): forward + backward with the AUTO-chosen (budgeted) blocks
        must match XLA autodiff (interpret mode)."""
        from itsd_tpu.kernels.attention import (_attention_flash_bwd,
                                                _attention_flash_stats)
        ks = jax.random.split(key, 4)
        shape = (1, 1024, 512)
        q, k, v, do = (jax.random.normal(kk, shape) * 0.1 for kk in ks)
        sc = 512 ** -0.5
        o, lse = _attention_flash_stats(q, k, v, sc, interpret=True)
        dq, dk, dv = _attention_flash_bwd(q, k, v, o, lse, do, sc,
                                          interpret=True)
        want_o, vjp = jax.vjp(lambda q, k, v: _attention_xla(q, k, v, sc),
                              q, k, v)
        wq, wk, wv = vjp(do)
        np.testing.assert_allclose(np.asarray(o), np.asarray(want_o),
                                   rtol=2e-4, atol=2e-4)
        for a, b in zip((dq, dk, dv), (wq, wk, wv)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
