"""structured_latent_odes_tpu — a TPU-native framework for structured latent ODE VAEs.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
paidamoyo/structured_latent_ODEs ("Capturing Actionable Dynamics with
Structured Latent Ordinary Differential Equations", UAI 2022):

- ``ode``      : batched fixed/adaptive-step ODE integrators (lax.scan), a
                 semilinear fast path (affine-step parallel scan) for
                 production-degradation neural dynamics, and a continuous
                 adjoint mode. Replaces torchdiffeq.
- ``prob``     : distribution log-probs, reparameterized sampling and an
                 explicit Trace-ELBO engine. Replaces pyro.infer/poutine.
- ``nn``       : pure-function neural nets (conv encoder, MLP builder,
                 decoders, neural ODE model) as param pytrees.
- ``models``   : the SLODE model zoo (CVS / proc / challenge x
                 {quantile, Gauss}) built from declarative latent-block specs.
- ``data``     : dataset generators/parsers/transforms (CVS, synbio proc,
                 viral challenge).
- ``train``    : SVI-style dual-loss trainers, metrics, checkpointing and the
                 ``.npy`` evaluation-artifact contract.
- ``parallel`` : jax.sharding Mesh / pjit data-parallel scale-out.
- ``ops``      : Pallas TPU kernels for the hot ops.
"""

__version__ = "0.1.0"

from structured_latent_odes_tpu.utils.config import Config  # noqa: F401
