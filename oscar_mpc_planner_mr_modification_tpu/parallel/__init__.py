from .tmpc import TMPCOptimizer  # noqa: F401
from .scenario import ScenarioOptimizer  # noqa: F401
