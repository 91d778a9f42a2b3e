"""Live visualization (GUI) for wildgs_slam_tpu.

The reference ships an Open3D/GLFW/OpenGL splat viewer fed by an mp.Queue
(src/gui/, 1686 LoC). This environment has no display stack, so the
TPU build provides two equivalents with the same data flow
(GaussianPacket-style snapshots emitted by the mapper):

  - `FileGui`: renders each packet to PNG panels (current render vs GT,
    depth, uncertainty, trajectory top-view) under <out>/gui/ and keeps an
    index.html that auto-refreshes — point any browser at it for a live
    view of a running SLAM session.
  - `export_viewer`: writes a self-contained interactive HTML point-cloud
    viewer (canvas 2D projection, orbit controls, no external deps) for the
    final Gaussian map.
"""

from .file_gui import FileGui, GaussianPacket
from .html_viewer import export_viewer

__all__ = ["FileGui", "GaussianPacket", "export_viewer"]
