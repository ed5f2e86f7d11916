from . import codec, fitness, mask, objective, oracle, render  # noqa: F401
from .objective import Objective, evaluate  # noqa: F401
from .render import render_splats  # noqa: F401
