from .comms import CommunicationTriggerReason, CommunicationTriggers  # noqa: F401
from .interpolation import (collision_mask_gk, geometric_deviation,  # noqa: F401
                            interpolate_trajectory_by_elapsed_time)
from .driver import MultiRobotDriver, RobotAgent  # noqa: F401
