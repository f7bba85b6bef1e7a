"""Device-mesh parallelism: batch DP, time-block halo SP, antenna axis."""
from .mesh import make_phy_mesh
from .sharded import (multichip_step, sharded_capture_decode,
                      sharded_frontend, sharded_rx)

__all__ = ["make_phy_mesh", "multichip_step", "sharded_capture_decode",
           "sharded_frontend", "sharded_rx"]
