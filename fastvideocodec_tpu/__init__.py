"""fastvideocodec_tpu: a TPU-native (JAX/XLA/Pallas) learned video compression framework.

Re-implements the capabilities of bochen-sysnet/FastVideoCodec (see SURVEY.md)
as an idiomatic JAX framework:

- Sequential P-frame codecs with recurrent autoencoders + recurrent
  probability models (DVC / RLVC / RLVC2), reference models.py:954-1051.
- LSVC / "Hermes" tree-structured codec coding a whole GOP in log-depth
  batched layers, reference models.py:1157-1411.
- ELFVC(-SP) / "Vesper" scale-space-flow codec with flow prediction and
  super-precision quantization-error recovery, reference models.py:1866-2124.
- MCVC-IA(-OLFT) multi-camera codec with cross-view attention, view-failure
  resilience and online fine-tuning, reference models.py:2240-2400.
- Base (+EC/+ER) experimental codec, reference models.py:1550-1835.

Everything device-side is NHWC, functional, and jit/scan/shard_map friendly;
real bitstreams are produced by a first-party C++ range coder on the host.
"""

__version__ = "0.1.0"

from fastvideocodec_tpu import ops  # noqa: F401
