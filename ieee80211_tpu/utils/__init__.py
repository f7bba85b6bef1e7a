from .binio import load_complex_bin, save_complex_bin

__all__ = ["load_complex_bin", "save_complex_bin"]
