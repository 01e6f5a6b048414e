"""OpenPyStruct-TPU: a TPU-native differentiable structural-optimization framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capability set of
dsmyl6/OpenPyStruct (reference mounted read-only at /root/reference):

- ``fem``     — batched differentiable Euler–Bernoulli beam / 2D-frame finite
  elements with an on-chip block-tridiagonal direct solver (replaces the
  external OpenSeesPy C++ engine, reference OpenPyStruct_BeamOpt.py:91-126).
- ``opt``     — Adam moment-of-inertia optimizers for beams and frames
  (reference OpenPyStruct_BeamOpt.py:179-244, OpenPyStruct_FrameOpt_Discrete_Beta.py).
- ``datagen`` — vmapped/pjit-sharded random-scenario data generation
  (replaces the SingleCore/MultiCore/GPU driver scripts).
- ``data``    — the shared preprocessing pipeline (padding, case grouping,
  standardization, label aggregation).
- ``models``  — Flax surrogates: FNN, PINN, FNO, chain-GNN,
  Transformer-Diffusion, and Bayesian variants.
- ``train``   — one shared jitted training harness for all surrogates.
- ``viz``     — host-side matplotlib reporting.
- ``parallel``— device-mesh / sharding utilities (ICI-first collectives).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("OPENPYSTRUCT_PLATFORM"):
    # Honest platform override.  On hosts where a PJRT plugin's boot hook
    # (e.g. the axon tunnel's sitecustomize) hard-sets
    # ``jax.config.jax_platforms`` at interpreter start, the standard
    # ``JAX_PLATFORMS`` env var is silently ignored — subprocesses that
    # believe they run on CPU actually dispatch through the remote TPU
    # tunnel (high-variance cold compiles, measured 44-475 s).  Re-applying
    # the config here wins because it runs before any backend initializes.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["OPENPYSTRUCT_PLATFORM"])

from openpystruct_tpu import config as config

__all__ = ["config", "__version__"]
