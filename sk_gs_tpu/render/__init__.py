from .settings import TILE, GaussianInputs, RasterConfig, ViewParams  # noqa: F401
from .preprocess import PreprocessOut, preprocess  # noqa: F401
from .binning import BinnedSplats, build_tile_lists  # noqa: F401
from .render import (composite_background, mark_visible, render,  # noqa: F401
                     render_topk)
from .reference import render_reference  # noqa: F401
