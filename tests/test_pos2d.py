"""Pos↔index bijection golden values (strategy: reference tests/test_pos2d.py)."""

from dctn_tpu.utils.pos2d import Pos2D, pos_to_index, index_to_pos, raster_positions


def test_pos_to_index_3x4():
    # grid with max_w=3:
    # 0 1 2  3
    # 4 5 6  7
    # 8 9 10 11
    assert pos_to_index(3, Pos2D(0, 0)) == 0
    assert pos_to_index(3, Pos2D(0, 3)) == 3
    assert pos_to_index(3, Pos2D(1, 0)) == 4
    assert pos_to_index(3, Pos2D(2, 2)) == 10


def test_bijection():
    for max_w in (0, 1, 2, 4):
        for index in range((max_w + 1) * 3):
            assert pos_to_index(max_w, index_to_pos(max_w, index)) == index


def test_raster_positions():
    assert raster_positions(2) == (
        Pos2D(0, 0),
        Pos2D(0, 1),
        Pos2D(1, 0),
        Pos2D(1, 1),
    )
