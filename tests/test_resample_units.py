"""Unit oracles for the framed-matmul polyphase resamplers
(ops/resample.py): the banded-Toeplitz matmul formulation must equal the
literal zero-stuffed FIR convolution it replaces, streaming state
included."""

import numpy as np
import jax.numpy as jnp

from webaudio_tpu.ops import resample as R


def _upsample_reference(x, factor, hist):
    """Literal zero-stuff + 'valid' conv with an upsampled-domain history
    (the pre-matmul formulation)."""
    h = R._interp_fir(factor)
    C, B = x.shape
    up = np.zeros((C, B * factor), np.float32)
    up[:, ::factor] = x
    # dense history maps to upsampled positions 0, f, 2f, ...
    hist_up = np.zeros((C, len(h) - 1), np.float32)
    dh = R.TAPS_PER_PHASE
    for i in range(dh):
        pos = i * factor
        if pos < len(h) - 1:
            hist_up[:, pos] = hist[:, i]
    ext = np.concatenate([hist_up, up], axis=1)
    y = np.stack([np.convolve(ext[c], h, mode="valid") for c in range(C)])
    return y.astype(np.float32)


def test_upsample_matches_zero_stuffed_conv():
    rng = np.random.RandomState(0)
    for factor in (2, 4):
        x = rng.randn(2, 512).astype(np.float32)
        hist = rng.randn(2, R.TAPS_PER_PHASE).astype(np.float32)
        y, new_state = R.upsample(jnp.asarray(x), factor, jnp.asarray(hist))
        ref = _upsample_reference(x, factor, hist)
        assert y.shape == (2, 512 * factor)
        np.testing.assert_allclose(np.asarray(y), ref[:, : y.shape[1]],
                                   atol=2e-5)
        # streaming state: the last TAPS_PER_PHASE dense samples
        np.testing.assert_array_equal(np.asarray(new_state),
                                      x[:, -R.TAPS_PER_PHASE:])


def test_downsample_matches_conv_decimate():
    rng = np.random.RandomState(1)
    for factor in (2, 4):
        h = R._interp_fir(factor) / np.float32(factor)
        B4 = 512 * factor
        x = rng.randn(2, B4).astype(np.float32)
        hist = rng.randn(2, len(h) - 1).astype(np.float32)
        y, new_state = R.downsample(jnp.asarray(x), factor, jnp.asarray(hist))
        ext = np.concatenate([hist, x], axis=1)
        full = np.stack([np.convolve(ext[c], h, mode="valid")
                         for c in range(2)])
        ref = full[:, ::factor].astype(np.float32)
        np.testing.assert_allclose(np.asarray(y), ref, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(new_state),
                                      ext[:, -(len(h) - 1):])


def test_streaming_equals_one_shot():
    """Two chained upsample+downsample blocks == one double-length block."""
    rng = np.random.RandomState(2)
    factor = 4
    x = rng.randn(1, 1024).astype(np.float32)
    s_up = R.up_fir_state(1, factor)
    s_dn = R.down_fir_state(1, factor)
    u1, s_up1 = R.upsample(jnp.asarray(x[:, :512]), factor, s_up)
    u2, _ = R.upsample(jnp.asarray(x[:, 512:]), factor, s_up1)
    d1, s_dn1 = R.downsample(u1, factor, s_dn)
    d2, _ = R.downsample(u2, factor, s_dn1)
    chained = np.concatenate([np.asarray(d1), np.asarray(d2)], axis=1)
    uf, _ = R.upsample(jnp.asarray(x), factor, s_up)
    df, _ = R.downsample(uf, factor, s_dn)
    np.testing.assert_allclose(chained, np.asarray(df), atol=1e-6)
