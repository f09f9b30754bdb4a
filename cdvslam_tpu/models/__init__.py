"""Neural networks (L3): VONet (DPVO-compatible) and CDVNet (semantic)."""
from .vonet import VONet  # noqa: F401
from .cdvnet import CDVNet, DIMI, DIMF, SCALEI, SCALEF  # noqa: F401
from .update import UpdateDPV, UpdateCDV, UpdateAux, build_update_aux  # noqa: F401
from .encoder import BasicEncoder4, BasicEncoder  # noqa: F401
from .heads import SegHeadFlatten, DepthHeadFlatten  # noqa: F401
from .patchifier import (  # noqa: F401
    select_random, select_gradient_bias, select_random_grid, select_score,
    extract_patches, pyramidify, coords_grid_with_index, image_gradient,
)
