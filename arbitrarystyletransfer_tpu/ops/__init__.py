from . import blocks, color, stats
