"""Analysis API unit tests: quality-map units, NoiseAnal spectra,
consumption maps, and row-stability statistics."""

import numpy as np

from pyimcom_tpu.analysis import NoiseAnal, unit_to_bels


class _FakeCfg:
    NsideP = 96
    Nside = 96
    postage_pad = 0
    n2 = 24
    dtheta = 0.04 / 3600
    use_filter = 4

    def __call__(self):
        pass


class _FakeOutImage:
    cfg = _FakeCfg()

    def __init__(self, img):
        self._img = img

    def get_coadded_layer(self, layer):
        return self._img


def test_unit_to_bels():
    assert abs(unit_to_bels("-0.2mB") + 0.0002) < 1e-15
    assert abs(unit_to_bels("5uB") - 5e-6) < 1e-18
    assert abs(unit_to_bels("20uB") - 2e-5) < 1e-18


def test_noiseanal_white_noise_level():
    """White noise: P(k) flat at (sigma * s_out)^2 with the physical norm
    (reference NoiseAnal.get_norm, analysis.py:618-660)."""
    rng = np.random.default_rng(0)
    na = NoiseAnal(_FakeOutImage(rng.normal(size=(96, 96))), "whitenoise1")
    na()
    assert na.ps2d.shape == (12, 12)
    assert na.ps1d.shape == (6, 2)
    s_out = 0.04
    assert abs(na.ps1d[:, 0].mean() / s_out ** 2 - 1) < 0.2
    # errors are non-negative (corner bins may hold a single pixel) and
    # much smaller than the means
    assert np.all(na.ps1d[:, 1] >= 0)
    assert np.all(na.ps1d[:-1, 1] > 0)
    assert np.all(na.ps1d[:, 1] < na.ps1d[:, 0] + 1e-30)
    na.clear()
    assert not hasattr(na, "ps2d")


def test_noiseanal_physical_constants():
    """Pin every transcribed physical constant against the reference values
    (reference analysis.py:596-601); a transcription drift here silently
    mis-normalizes lab-noise power spectra."""
    assert NoiseAnal.AREA == {"Y106": 7006.0, "J129": 7111.0,
                              "H158": 7340.0, "F184": 4840.0,
                              "K213": 4654.0, "W146": 22085.0}
    assert NoiseAnal.tfr == 3.08
    assert NoiseAnal.gain == 1.458
    assert NoiseAnal.ABstd == 3.631e-20
    assert NoiseAnal.h == 6.62607015e-27
    assert NoiseAnal.m_ab == 23.9


def test_consump_map_from_logs(tmp_path):
    """Consumption maps parse 'finished at t = <sec> s' from per-block logs
    (reference analysis.py:166-183, 1128-1163)."""
    from pyimcom_tpu.analysis import Mosaic, OutImage

    class _FakeMosaic(Mosaic):
        def __init__(self, stem, nblock):
            self.stem = str(stem)
            self.suffix = ".fits"
            self.nblock = nblock
            self.images = {}

        def __getitem__(self, key):
            oi = OutImage.__new__(OutImage)
            oi.fpath = self._path(*key)
            return oi

    mos = _FakeMosaic(tmp_path / "m", 2)
    times = {(0, 0): 12.5, (0, 1): 20.0, (1, 0): 7.25, (1, 1): 100.0}
    for (ibx, iby), t in times.items():
        with open(str(tmp_path / f"m_{ibx:02d}_{iby:02d}.out"), "w") as f:
            f.write("some log line\n")
            f.write(f"finished at t = {t} s\n")
    cm = mos.get_consump_map()
    for (ibx, iby), t in times.items():
        assert cm[iby, ibx] == t
    # cached on disk
    assert (tmp_path / "m_Consump.npy").exists()
    cm2 = mos.get_consump_map()
    np.testing.assert_allclose(cm2, cm)


def test_row_stability_stats():
    from pyimcom_tpu.diagnostics.stability import row_stability_stats

    rng = np.random.default_rng(3)
    base = rng.normal(size=128)
    profiles = np.stack([base + rng.normal(scale=0.01, size=128)
                         for _ in range(6)])
    profiles[:, 40] += np.linspace(-1, 1, 6)   # one unstable row
    stats = row_stability_stats(profiles)
    assert stats["worst_rows"][0] == 40
    assert stats["max_drift"] > 10 * stats["rms_drift"]
    np.testing.assert_allclose(stats["mean_profile"].shape, (128,))
