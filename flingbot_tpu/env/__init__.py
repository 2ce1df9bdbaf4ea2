from flingbot_tpu.env.coverage import get_current_covered_area
from flingbot_tpu.env.tasks import Task, TaskLoader
from flingbot_tpu.env.scene import Scene, make_scene, set_scene

__all__ = [
    "get_current_covered_area",
    "Task",
    "TaskLoader",
    "Scene",
    "make_scene",
    "set_scene",
]
