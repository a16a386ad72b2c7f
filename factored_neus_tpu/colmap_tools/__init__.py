"""Standalone COLMAP interchange utilities.

The reference vendors COLMAP's script collection (ref:colmap/*) but never
imports it from the pipeline; the pieces it DOES use were rebuilt in round 1
(ref:colmap/read_write_model.py -> data/colmap_model.py,
ref:colmap/plyfile.py -> meshing/ply.py). This package rebuilds the
remaining pieces that are useful to a user preprocessing their own scenes:

  database  — COLMAP sqlite database creation/reading (the public schema)
  dense     — COLMAP MVS .bin depth/normal map I/O ("w&h&c&" header,
              column-major f32)
  export    — sparse model -> PLY point cloud; PLY merging
  fused     — MVS fused.ply + fused.ply.vis point-visibility I/O
  visualize — headless model viewer equivalent: cameras-as-frustums +
              filtered points exported to one PLY

Out of scope (not rebuilt, by design): COLMAP's own build scripts
(ref:colmap/build.py drives CMake for the C++ COLMAP binary), the Windows
app packager, the Flickr crawler, and format converters for third-party
SfM tools (bundler/visualsfm/nvm) — none touch this framework's pipeline.
"""
from . import database, dense, export, fused, visualize  # noqa: F401
