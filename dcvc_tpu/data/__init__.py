from .datasets import ImageFolder, VideoFolder, BatchLoader

__all__ = ["ImageFolder", "VideoFolder", "BatchLoader"]
