from .repository import FileInfo, EpisodeRepository, NpzEpisodeRepository, make_repository
from .dataset import SequentialDataset
from .preprocessing import Preprocessor
from .prefetch import ParallelLoader, prefetch_iterator

__all__ = [
    "FileInfo", "EpisodeRepository", "NpzEpisodeRepository", "make_repository",
    "SequentialDataset", "Preprocessor", "ParallelLoader", "prefetch_iterator",
]
