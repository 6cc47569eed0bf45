"""sprc_tpu — a TPU-native composed-image-retrieval (CIR) framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of SPRC
("Sentence-level Prompts Benefit Composed Image Retrieval", ICLR 2024,
reference: chunmeifeng/SPRC), designed TPU-first:

- models are pure-functional flax modules compiled with ``jax.jit``/``pjit``
- the frozen vision towers run in bfloat16 with float32 LayerNorms
- attention hot paths lower to Pallas TPU kernels where it pays
- retrieval (gallery encode + token-max similarity ranking) is sharded over a
  ``jax.sharding.Mesh`` with XLA collectives over ICI
- training uses optax + orbax with full optimizer-state resume (fixing the
  reference's resume gap, see reference src/utils.py:208-222)

Public entry points mirror the reference's capabilities
(`load_model_and_preprocess`, train/validate/submission CLIs) without
copying its torch implementation.
"""

from sprc_tpu.version import __version__
from sprc_tpu.registry import registry
from sprc_tpu import models as _models  # populate the registry
from sprc_tpu.features import extract_features
from sprc_tpu.loader import load_model, load_model_and_preprocess, model_zoo

__all__ = [
    "__version__",
    "registry",
    "extract_features",
    "load_model",
    "load_model_and_preprocess",
    "model_zoo",
]
