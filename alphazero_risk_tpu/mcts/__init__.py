from .outcomes import OUTCOME_PROBS
from .search import SearchResult, Tree, pick_move
from .search import search as run_search
from . import search  # keep the submodule binding (don't shadow)
