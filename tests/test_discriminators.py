"""HiFi-GAN discriminator tests (shapes, losses) vs reference where
importable."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_arabic_tpu.vocoder.discriminators import (MultiPeriodDiscriminator,
                                                   MultiScaleDiscriminator,
                                                   discriminator_loss,
                                                   feature_loss,
                                                   generator_loss)


@pytest.fixture(scope="module")
def waves():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((2, 8192)).astype(np.float32) * 0.3
    y_hat = rng.standard_normal((2, 8192)).astype(np.float32) * 0.3
    return jnp.asarray(y), jnp.asarray(y_hat)


def test_mpd_shapes_and_losses(waves):
    y, y_hat = waves
    mpd = MultiPeriodDiscriminator()
    v = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    s_r, s_g, f_r, f_g = mpd.apply(v, y, y_hat)
    assert len(s_r) == len(s_g) == 5
    assert all(len(f) == 6 for f in f_r)
    d_loss, r_l, g_l = discriminator_loss(s_r, s_g)
    g_loss, _ = generator_loss(s_g)
    fm = feature_loss(f_r, f_g)
    for val in (d_loss, g_loss, fm):
        assert np.isfinite(float(val))
    assert len(r_l) == 5


def test_msd_shapes(waves):
    y, y_hat = waves
    msd = MultiScaleDiscriminator()
    v = msd.init(jax.random.PRNGKey(1), y, y_hat)
    s_r, s_g, f_r, f_g = msd.apply(v, y, y_hat)
    assert len(s_r) == 3
    assert all(len(f) == 8 for f in f_r)
    # scales shrink the score length
    assert s_r[0].shape[1] > s_r[1].shape[1] > s_r[2].shape[1]


def test_period_padding():
    from tts_arabic_tpu.vocoder.discriminators import PeriodDiscriminator
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 1000)).astype(np.float32))
    d = PeriodDiscriminator(period=7)  # 1000 % 7 != 0 -> reflect pad
    v = d.init(jax.random.PRNGKey(0), x)
    score, fmaps = d.apply(v, x)
    assert np.isfinite(np.asarray(score)).all()
