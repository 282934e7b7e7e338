"""Architecture bookkeeping unit tests.

Expected maps mirror the reference's hand-written architecture assertions
(/root/reference/test/units/test_model.py:28-108).
"""
from awebox_tpu.arch import Architecture


def test_single_kite():
    arch = Architecture({1: 0})
    assert arch.number_of_nodes == 2
    assert arch.kite_nodes == [1]
    assert arch.number_of_kites == 1
    assert arch.layer_nodes == [0]
    assert arch.node_label(1) == '10'


def test_dual_kite():
    arch = Architecture({1: 0, 2: 1, 3: 1})
    assert arch.number_of_nodes == 4
    assert arch.kite_nodes == [2, 3]
    assert arch.layer_nodes == [1]
    assert arch.kites_map == {1: [2, 3]}
    assert arch.children_map[1] == [2, 3]
    assert arch.siblings_map[2] == [2, 3]
    assert arch.node_label(2) == '21'
    assert arch.parent_label(2) == '10'


def test_triple_kite_two_layers():
    arch = Architecture({1: 0, 2: 1, 3: 2, 4: 2, 5: 1, 6: 5, 7: 5})
    assert arch.kite_nodes == [3, 4, 6, 7]
    assert arch.layer_nodes == [2, 5]
    assert arch.layers == 2


def test_invalid():
    import pytest
    with pytest.raises(ValueError):
        Architecture({2: 0})
    with pytest.raises(ValueError):
        Architecture({1: 1})
