from flingbot_tpu.env.coverage import get_current_covered_area
from flingbot_tpu.env.tasks import Task, TaskLoader, generate_tasks
from flingbot_tpu.env.scene import Scene, make_scene, set_scene
from flingbot_tpu.env.sim_env import SimEnv
from flingbot_tpu.env.batch_env import BatchSimEnv
from flingbot_tpu.env.primitives import PrimitiveConfig, execute_primitive

__all__ = [
    "get_current_covered_area",
    "Task",
    "TaskLoader",
    "generate_tasks",
    "Scene",
    "make_scene",
    "set_scene",
    "SimEnv",
    "BatchSimEnv",
    "PrimitiveConfig",
    "execute_primitive",
]
