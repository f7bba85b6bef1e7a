from .binio import load_complex_bin, save_complex_bin
from .riq import c2r, r2c, r_of

__all__ = ["load_complex_bin", "save_complex_bin", "c2r", "r2c", "r_of"]
