"""Device-side numerical kernels: interpolation, PSF models, Fourier overlaps."""
