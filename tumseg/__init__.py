"""tumseg — a TPU-native (JAX/XLA/Pallas) semantic-segmentation framework for
facade LiDAR point clouds (TUM-Facade), providing the full capability surface of
the reference PyTorch pipeline (PointNet / PointNet++ semantic segmentation)
re-designed for TPU hardware:

- ``tumseg.ops``      point-cloud kernels (FPS, ball query, gather, 3-NN interp)
                      with XLA compositions and Pallas TPU kernels behind one API
- ``tumseg.nn``       functional layers (set abstraction, feature propagation, STN)
- ``tumseg.models``   model registry: ``pointnet2_sem_seg``, ``pointnet_sem_seg``
- ``tumseg.data``     pure-NumPy LAS I/O, block samplers, augmentations, geo features
- ``tumseg.parallel`` device mesh / sharding helpers (ICI-first collectives)
- ``tumseg.train``    jit-compiled train/eval engine, schedules, checkpoints
- ``tumseg.infer``    whole-scene sharded voting inference
- ``tumseg.viz``      .obj/.txt writers, C++ ball-sprite renderer + viewer
- ``tumseg.cli``      argparse CLIs mirroring the reference's flags bit-for-bit
"""

__version__ = "0.1.0"
