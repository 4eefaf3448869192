"""Loss input helpers (reference ``src/pti_ldm_vae/utils/losses.py``).

``ensure_three_channels`` lives with the LPIPS model in this framework; this
module re-exports it at the reference's location for drop-in familiarity.
"""

from ..models.lpips import ensure_three_channels

__all__ = ["ensure_three_channels"]
