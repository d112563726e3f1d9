"""vnext_tpu: a TPU-native (JAX/XLA/Pallas) video instance segmentation framework.

Re-implements the capabilities of wjf5203/VNext (Detectron2 + IDOL/SeqFormer/InstMove)
as an idiomatic JAX framework: flax modules compiled with jit/pjit over device meshes,
fixed-shape padded structures instead of dynamic Instances, and Pallas kernels for the
hot multi-scale deformable attention op.
"""

__version__ = "0.1.0"
