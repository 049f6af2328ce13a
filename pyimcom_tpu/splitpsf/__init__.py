"""PSF wing splitting and subtraction (iterative bright-wing correction)."""

from .splitpsf import SplitPSF, split_psf_to_fits  # noqa: F401
from .update_cube import update as update_cube  # noqa: F401
