"""fuse_disc_passes must refuse random-window discriminators: the fused
[real; fake] forward shares one window RNG, while the reference draws fresh
windows per pass (style_melgan.py:333)."""

import pytest

from articulatory_tpu.train.gan import _check_fuse_disc


def test_fuse_disc_rejects_style_melgan():
    with pytest.raises(ValueError, match="random-window"):
        _check_fuse_disc({"fuse_disc_passes": True,
                          "discriminator_type": "StyleMelGANDiscriminator"})


def test_fuse_disc_ok_for_window_free_disc():
    assert _check_fuse_disc(
        {"fuse_disc_passes": True,
         "discriminator_type": "HiFiGANMultiScaleMultiPeriodDiscriminator"})
    assert not _check_fuse_disc(
        {"discriminator_type": "StyleMelGANDiscriminator"})
