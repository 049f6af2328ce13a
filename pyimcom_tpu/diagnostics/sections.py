"""
Standard report sections: mosaic image, layer statistics, simulated-star
quality, and noise diagnostics.

Counterparts of reference diagnostics/mosaicimage.py, layer_diagnostics.py,
stars.py, and noise_diagnostics.py, operating through the OutImage API.
"""

from __future__ import annotations

import glob

import numpy as np

from ..analysis import NoiseAnal, OutImage
from ..utils.moments import find_adaptive_moments
from .report import ReportSection


def _blocks_of(report):
    """All block files sharing the report's stem."""
    fname = report.fname
    stem = fname[:-11]
    return sorted(glob.glob(stem + "_[0-9][0-9]_[0-9][0-9].fits"))


class MosaicImage(ReportSection):
    """Grayscale mosaic rendering of the science layer."""

    def build(self):
        import matplotlib.pyplot as plt

        blocks = _blocks_of(self.report)
        imgs = {}
        for b in blocks:
            oi = OutImage(b)
            imgs[(oi.ibx, oi.iby)] = oi.get_coadded_layer(0)
        if not imgs:
            return
        nb = max(max(k) for k in imgs) + 1
        nside = next(iter(imgs.values())).shape[0]
        canvas = np.zeros((nb * nside, nb * nside), dtype=np.float32)
        for (ibx, iby), im in imgs.items():
            canvas[iby * nside:(iby + 1) * nside, ibx * nside:(ibx + 1) * nside] = im
        fig, ax = plt.subplots(figsize=(8, 8))
        v = np.percentile(canvas, 99.5)
        ax.imshow(np.arcsinh(canvas / max(v / 100, 1e-12)), origin="lower",
                  cmap="gray")
        ax.set_title("Mosaic science layer (asinh stretch)")
        self.figures.append(fig)
        self.add_datablock("MOSAICSTATS",
                           f"nblocks {len(imgs)}\nmax {canvas.max():.6e}\n"
                           f"p99 {np.percentile(canvas, 99):.6e}")


class LayerReport(ReportSection):
    """Percentile statistics of every coadded layer."""

    def build(self):
        import matplotlib.pyplot as plt

        oi = OutImage(self.report.fname)
        nlayer = oi.cfg.n_inframe
        rows = []
        for il in range(nlayer):
            img = oi.get_coadded_layer(il)
            pct = np.percentile(img, [1, 10, 50, 90, 99])
            name = oi.cfg.extrainput[il] or "SCI"
            rows.append((name, *pct))
        fig, ax = plt.subplots(figsize=(8.5, 0.5 + 0.4 * nlayer))
        ax.axis("off")
        tab = [["layer", "p1", "p10", "p50", "p90", "p99"]] + [
            [r[0]] + [f"{v:.3e}" for v in r[1:]] for r in rows]
        ax.table(cellText=tab, loc="center")
        ax.set_title("Layer percentiles")
        self.figures.append(fig)
        text = "\n".join(" ".join(str(x) for x in r) for r in rows)
        self.add_datablock("LAYERPERCENTILES", text)


class SimulatedStar(ReportSection):
    """Adaptive moments of injected-grid stars vs the target PSF."""

    def __init__(self, report, layer="cstar14"):
        super().__init__(report)
        self.layer = layer

    def build(self):
        import matplotlib.pyplot as plt

        oi = OutImage(self.report.fname)
        try:
            img = oi.get_coadded_layer(self.layer)
        except KeyError:
            return
        # find local maxima above threshold as star candidates
        thr = 0.2 * img.max()
        win = 8
        results = []
        work = img.copy()
        for _ in range(20):
            iy, ix = np.unravel_index(np.argmax(work), work.shape)
            if work[iy, ix] < thr:
                break
            y0, y1 = max(0, iy - win), min(img.shape[0], iy + win + 1)
            x0, x1 = max(0, ix - win), min(img.shape[1], ix + win + 1)
            if y1 - y0 > 2 * win - 2 and x1 - x0 > 2 * win - 2:
                m = find_adaptive_moments(img[y0:y1, x0:x1])
                if m.converged:
                    results.append((ix, iy, m.moments_sigma, m.observed_e1,
                                    m.observed_e2, m.moments_amp))
            work[y0:y1, x0:x1] = 0.0
        if not results:
            return
        res = np.array(results)
        target_sigma = (oi.cfg.sigmatarget * 0.11 / (oi.cfg.dtheta * 3600))
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.hist(res[:, 2], bins=10)
        ax.axvline(target_sigma, color="r", ls="--", label="target sigma")
        ax.set_xlabel("adaptive sigma [output px]")
        ax.legend()
        ax.set_title(f"Simulated stars ({self.layer}): {len(res)} measured")
        self.figures.append(fig)
        self.add_datablock(
            "STARMOMENTS",
            f"nstars {len(res)}\nsigma_mean {res[:, 2].mean():.6f}\n"
            f"sigma_target {target_sigma:.6f}\n"
            f"e1_mean {res[:, 3].mean():.2e}\ne2_mean {res[:, 4].mean():.2e}")


class NoiseReport(ReportSection):
    """Power spectra of the coadded noise layers."""

    def build(self):
        import matplotlib.pyplot as plt

        oi = OutImage(self.report.fname)
        fig, ax = plt.subplots(figsize=(6, 4))
        text_lines = []
        found = False
        ps2d_figs = []
        for il, spec in enumerate(oi.cfg.extrainput):
            if spec is None or not ("noise" in spec.lower()):
                continue
            kc, pk = NoiseAnal(oi, layer=il).power_spectrum()
            ax.loglog(kc[1:], pk[1:], label=spec)
            text_lines.append(f"{spec} white-level {np.median(pk[len(pk)//2:]):.4e}")
            found = True  # the basic spectrum is already on fig
            # reference-style physically normalized 1D + binned 2D spectra
            # (reference NoiseAnal.__call__, analysis.py:745-808)
            na = NoiseAnal(oi, layer=spec)
            try:
                na()
            except Exception:  # noqa: BLE001 -- layer-name conventions vary
                continue
            f2, a2 = plt.subplots(1, 2, figsize=(9, 4))
            im = a2[0].imshow(np.log10(np.maximum(na.ps2d, 1e-30)),
                              origin="lower", cmap="viridis")
            a2[0].set_title(f"{spec}: log10 P2D (8x8 binned)")
            f2.colorbar(im, ax=a2[0])
            nb = len(na.ps1d)
            a2[1].errorbar(np.arange(nb), na.ps1d[:, 0], yerr=na.ps1d[:, 1],
                           fmt="o-", ms=3)
            a2[1].set_xlabel("radial bin")
            a2[1].set_ylabel("P(k) [physical norm]")
            a2[1].set_title("azimuthal average")
            f2.tight_layout()
            ps2d_figs.append(f2)
            text_lines.append(
                f"{spec} ps1d " + " ".join(f"{v:.5e}" for v in na.ps1d[:, 0]))
            na.clear()
        if not found:
            plt.close(fig)
            return
        ax.set_xlabel("k [cycles/pixel]")
        ax.set_ylabel("P(k)")
        ax.legend()
        ax.set_title("Coadded noise power spectra")
        self.figures.append(fig)
        self.figures.extend(ps2d_figs)
        self.add_datablock("NOISEPOWER", "\n".join(text_lines))


class DynamicRange(ReportSection):
    """Noise/coverage histograms + star dynamic-range profiles
    (reference diagnostics/dynrange.py via stars.py)."""

    def build(self):
        import matplotlib.pyplot as plt

        from .starsdata import gen_dynrange_data

        fname = self.report.fname
        stem = fname[:-11]

        def infile(ibx, iby):
            return f"{stem}_{ibx:02d}_{iby:02d}.fits"

        out = gen_dynrange_data(infile, self.report.outstem)
        if out["COUNTBLOCK"] == 0:
            return
        lines = [f"countblock {out['COUNTBLOCK']}"]
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        for ax, key, label in ((axes[0], "SQRTS", "noise amplification"),
                               (axes[1], "NEFF", "effective coverage")):
            if out[key] is None:
                continue
            h = np.loadtxt(out[key])
            ax.bar(h[:, 0], h[:, 1], width=h[1, 0] - h[0, 0])
            ax.set_xlabel(label)
            pk, off = out[key + "_HEADER"]
            lines.append(f"{key} peak {pk:.0f} offscale_pct {off:.4f}")
        self.figures.append(fig)
        if out["DYNRANGE"] is not None:
            prof = np.loadtxt(out["DYNRANGE"])
            fig2, ax2 = plt.subplots(figsize=(6, 4))
            for i, q in enumerate((1, 5, 25, 50, 75, 95, 99)):
                ax2.semilogy(prof[:, 0], np.abs(prof[:, 2 + i]) + 1e-12,
                             label=f"p{q}")
            ax2.set_xlabel("radius [px]")
            ax2.legend(fontsize=6)
            ax2.set_title("star profile percentiles")
            self.figures.append(fig2)
            lines.append("dynrange rows " + str(prof.shape[0]))
        self.add_datablock("DYNRANGE", "\n".join(lines))


class StarCube(ReportSection):
    """Noiseless injected-star cube moments + fidelity histogram
    (reference diagnostics/starcube_nonoise.py via stars.py)."""

    def build(self):
        import matplotlib.pyplot as plt

        from .starsdata import gen_starcube_nonoise

        fname = self.report.fname
        stem = fname[:-11]

        def infile(ibx, iby):
            return f"{stem}_{ibx:02d}_{iby:02d}.fits"

        out = gen_starcube_nonoise(infile, self.report.outstem)
        if out["STARCAT"] is None:
            return
        cat = np.loadtxt(out["STARCAT"]).reshape(-1, 22)
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.scatter(cat[:, 14], cat[:, 15], s=4)
        ax.set_xlabel("g1")
        ax.set_ylabel("g2")
        ax.set_title(f"noiseless star shapes (n={len(cat)})")
        self.figures.append(fig)
        self.add_datablock(
            "STARCUBE",
            f"nstars {len(cat)}\nsigma_med {np.median(cat[:, 13]):.6f}\n"
            f"g1_med {np.median(cat[:, 14]):.2e}\n"
            f"g2_med {np.median(cat[:, 15]):.2e}\n"
            f"fid_med_dB {np.median(cat[:, 20]):.2f}")


class RowStability(ReportSection):
    """
    Row-stability diagnostics of destriped exposures (reference
    diagnostics/noise/stability.py): heatmap + mean/std band of per-exposure
    row-median profiles, grouped by SCA.

    Parameters
    ----------
    directory : directory of destriped FITS exposures (imdestripe output);
        when None the section is skipped (coadd-only reports).
    pattern : regex with group(1) = observation name and group(2) = SCA.
    """

    def __init__(self, report, directory=None,
                 pattern=r"ds_(\w+_\d+)_(\d+)\.fits$"):
        super().__init__(report)
        self.directory = directory
        self.pattern = pattern

    def build(self):
        import os
        import re

        import matplotlib.pyplot as plt

        from .stability import row_stability_stats

        if not self.directory or not os.path.isdir(self.directory):
            return
        from ..fitsio import fits_read

        pat = re.compile(self.pattern)
        by_sca = {}
        for fn in sorted(os.listdir(self.directory)):
            m = pat.search(fn)
            if not m:
                continue
            img = np.asarray(fits_read(os.path.join(self.directory, fn))[0].data,
                             dtype=np.float64)
            by_sca.setdefault(m.group(2), []).append(np.median(img, axis=1))

        lines = []
        for sca, profiles in sorted(by_sca.items()):
            rp = np.array(profiles)
            stats = row_stability_stats(rp)
            fig, axes = plt.subplots(2, 1, figsize=(8, 7), sharex=True)
            axes[0].imshow(rp, aspect="auto", origin="lower",
                           interpolation="nearest", cmap="RdBu_r")
            axes[0].set_ylabel("exposure")
            axes[0].set_title(f"SCA {sca}: row stability "
                              f"(rms drift {stats['rms_drift']:.3e})")
            rows = np.arange(rp.shape[1])
            axes[1].plot(rows, stats["mean_profile"], lw=0.8)
            axes[1].fill_between(rows,
                                 stats["mean_profile"] - stats["std_profile"],
                                 stats["mean_profile"] + stats["std_profile"],
                                 alpha=0.4)
            axes[1].set_xlabel("detector row")
            fig.tight_layout()
            self.figures.append(fig)
            lines.append(f"{sca} {rp.shape[0]} {stats['rms_drift']:.6e} "
                         f"{stats['max_drift']:.6e}")
        if lines:
            self.add_datablock("ROWSTABILITY",
                               "sca n_exposures rms_drift max_drift\n"
                               + "\n".join(lines))
