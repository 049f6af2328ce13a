

def test_sip_corrected_wcs_submillipixel():
    """'ASTROPY+' mode: SIP fit + error-map refinement reproduces an exact
    distorted mapping to <1e-3 px (reference wcsutil.py:459-592 guarantee)."""
    import numpy as np

    from pyimcom_tpu.wcsutil import WCS, PyIMCOM_WCS, SIPCorrectedWCS

    nside = 512
    base = WCS(ctype=("RA---TAN", "DEC--TAN"), crval=(30.0, -20.0),
               crpix=((nside - 1) / 2, (nside - 1) / 2),
               cd=np.array([[-3.05e-5, 0.4e-5], [0.4e-5, 3.05e-5]]),
               lonpole=180.0)

    def exact(x, y):
        # smooth high-order distortion (beyond the SIP-2 fit): a few px
        u = (np.asarray(x) - 255.5) / 255.5
        v = (np.asarray(y) - 255.5) / 255.5
        dx = 2.0 * u ** 3 * v + 0.7 * np.sin(2.2 * u) * v ** 2
        dy = -1.5 * v ** 3 + 0.5 * u ** 2 * v ** 2
        return base.pix2world(np.asarray(x) + dx, np.asarray(y) + dy)

    w = SIPCorrectedWCS(exact, nside, order=2, ngrid=64, err_step=4)
    rng = np.random.default_rng(0)
    x = rng.uniform(5, nside - 6, 400)
    y = rng.uniform(5, nside - 6, 400)
    ra, dec = exact(x, y)
    xi, yi = w.world2pix(ra, dec)
    err = np.hypot(xi - x, yi - y)
    assert err.max() < 1e-3, err.max()

    # forward direction: pix2world matches the exact mapping to the same
    # tolerance (measured as the pixel-scale-equivalent offset)
    ra2, dec2 = w.pix2world(x, y)
    dpix = np.hypot((ra2 - ra) * np.cos(np.deg2rad(dec)), dec2 - dec) / 3.2e-5
    assert dpix.max() < 1.5e-3, dpix.max()

    # PyIMCOM_WCS dispatches callables to the corrected mode
    w2 = PyIMCOM_WCS(exact, nside=nside, order=2, ngrid=64, err_step=4)
    assert isinstance(w2, SIPCorrectedWCS)
