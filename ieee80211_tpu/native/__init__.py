from .lib import available, crc32, deagg, find_triggers, pack_bits

__all__ = ["available", "crc32", "deagg", "find_triggers", "pack_bits"]
