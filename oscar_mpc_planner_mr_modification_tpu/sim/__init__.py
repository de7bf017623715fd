from .pedestrians import PedestrianSimulator, Pedestrian  # noqa: F401
from .environment import SimEnvironment  # noqa: F401
