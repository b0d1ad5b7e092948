"""scale_imagenet_tpu — a TPU-native (JAX/XLA/Pallas) truth-table-network framework.

A ground-up re-design of the capabilities of the TTnet ``scale_imagenet``
reference (PyTorch/CUDA) for TPU hardware:

* quantization primitives with straight-through estimators (``ops``)
* a functional layer library with torch-compatible numerics (``layers``)
* the TTnet block + config-driven model zoo (``models``)
* PyTorch checkpoint import + BN-folding transforms (``convert``)
* the truth-table / CNF-DNF compiler (``compile``)
* ImageNet/CIFAR input pipeline with device prefetch (``data``)
* SPMD data/model-parallel execution over a jax.sharding.Mesh (``parallel``)
* training / evaluation harness (``train``, ``runtime``)
* fused Pallas TPU kernels (``pallas``)
"""

__version__ = "0.1.0"
