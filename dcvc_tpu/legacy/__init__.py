"""Legacy DCVC-family components (DCVC/TCM/HEM/DC/FM/RT/EVC lineage).

Shared motion/normalization ops and model variants that predate the
DCVC-UF chunk codec; reference: /root/reference/DCVC-family/*.
"""

from .ops import flow_warp, bilinear_upsample_2x, avg_pool_2x, block_mc
from .spynet import MEBasic, MESpynet
from .gdn import GDN

__all__ = ["flow_warp", "bilinear_upsample_2x", "avg_pool_2x", "block_mc",
           "MEBasic", "MESpynet", "GDN"]
