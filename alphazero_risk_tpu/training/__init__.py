from . import actor, learner
from . import replay, trainer, checkpoints
