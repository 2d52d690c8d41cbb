from .dreamer import Dreamer, WorldModel
from .baselines import WorldModelProbe

__all__ = ["Dreamer", "WorldModel", "WorldModelProbe"]
