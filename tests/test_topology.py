import numpy as np

from alphazero_risk_tpu.env import topology as T


def test_adjacency_symmetric_and_connected():
    assert (T.ADJACENCY == T.ADJACENCY.T).all()
    assert not T.ADJACENCY.diagonal().any()
    # whole map is one connected component
    reach = np.eye(42, dtype=bool)
    for _ in range(42):
        reach = reach | (reach @ T.ADJACENCY)
    assert reach.all()


def test_degrees_match_reference():
    # total edge endpoints in the reference lists (land.cpp:246-297)
    degs = T.ADJACENCY.sum(1)
    assert degs.min() == 2 and degs.max() == 6
    assert degs.sum() == sum(len(n) for n in T.NEIGHBORS)


def test_continents_partition():
    assert (T.CONTINENT_MASK.sum(0) == 1).all()
    assert T.CONTINENT_SIZE.tolist() == [9, 4, 7, 6, 12, 4]
    assert T.CONTINENT_BONUS.tolist() == [5, 2, 5, 3, 7, 2]


def test_continent_tie_rank():
    # AUSTRALIA > ASIA > AFRICA > EUROPE > SOUTH_AMERICA > NORTH_AMERICA
    order = [T.CONTINENT_NAMES[i] for i in np.argsort(T.CONTINENT_TIE_RANK)]
    assert order == ["AUSTRALIA", "ASIA", "AFRICA", "EUROPE",
                     "SOUTH_AMERICA", "NORTH_AMERICA"]


def test_cards_partition():
    assert T.CARD_INFANTRY.sum() == 14
    assert T.CARD_HORSE.sum() == 14
    assert T.CARD_SIEGE.sum() == 14
    assert not (T.CARD_INFANTRY & T.CARD_HORSE).any()
