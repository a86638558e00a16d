from .windows import window_views, window_views_at_positions, make_windows, out_spatial
from .rank_one import RankOneTensorsBatch
from . import eps
from . import sbs
from . import composition
from . import logmatmulexp  # module (functions: logmatmulexp.logmatmulexp, .logmatmulexp_lowmem)
