from . import topology
from .state import GameState, new_game, invert_players, set_current_player
from .rules import (
    legal_actions,
    game_status,
    step,
    step_key,
    roll_dice,
    player_masks,
    calc_reinforcement,
)
from .featurize import featurize
