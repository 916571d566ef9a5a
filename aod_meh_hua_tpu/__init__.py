"""aod_meh_hua_tpu — TPU-native active-learning object detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
MoonLab-YH/AOD_MEH_HUA (ICLR 2023: "Active Learning for Object Detection
with Evidential Deep Learning and Hierarchical Uncertainty Aggregation"):

* Evidential (Dirichlet) classification heads on RetinaNet / SSD detectors.
* MEH (Model Evidence Head): an auxiliary branch regressing the detector's
  own per-anchor classification loss; its output rescales Dirichlet
  concentrations at scoring time.
* HUA (Hierarchical Uncertainty Aggregation): class -> scale -> object
  bottom-up aggregation of per-anchor epistemic uncertainty into one
  image-level acquisition score.
* A pool-based active-learning loop over PASCAL VOC.

Design stance (TPU-first, not a port): pure functions over pytrees, static
shapes everywhere (fixed image canvas, masked/padded GT, fixed-size NMS),
one jit-compiled train step and one jit-compiled score step, SPMD data
parallelism via jax.sharding.Mesh, and the AL loop as a thin host-side
orchestrator.
"""

__version__ = "0.1.0"
