from .pos2d import Pos2D, pos_to_index, index_to_pos
from .misc import implies, xor, exactly_one_true
