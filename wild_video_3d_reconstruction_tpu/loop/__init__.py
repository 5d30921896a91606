from . import cache, keypoints, netvlad, pgo, retrieval, umeyama
from .longterm import LongTermLoopClosure
