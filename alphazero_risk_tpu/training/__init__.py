from . import actor, learner
