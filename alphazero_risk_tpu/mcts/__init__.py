from .outcomes import OUTCOME_PROBS
from .search import SearchResult, Tree, pick_move, search
