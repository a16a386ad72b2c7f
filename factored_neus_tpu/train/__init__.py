from . import common, losses, stage1, stage2, stage3  # noqa: F401

# runner1/2/3 are imported lazily by the CLIs (they pull in the full data/
# meshing/eval stack).
