from .tmpc import TMPCOptimizer  # noqa: F401
from .scenario import ScenarioOptimizer  # noqa: F401
from .rollout import (  # noqa: F401
    antipodal_circle_scenes, make_batch_rollout, make_contouring_rollout,
    make_multirobot_rollout, sample_scenes)
