from .common import draw_step_randoms, masked_choice
from .driver import (
    AGENT_RANDOM,
    AGENT_SCRIPT,
    MatchResult,
    mirrored_initial_states,
    play_match,
    summarize,
)
from .random_agent import random_step
from .script_agent import ScriptCarry, init_carry, script_step
