"""mst_tpu — a TPU-native (JAX/XLA/Pallas/pjit) trajectory-forecasting framework.

Re-designed from scratch with the capabilities of vita-epfl/motion-style-transfer
(Y-Net / Y-Net-Mod goal-conditioned forecasting + parameter-efficient motion-style
adaptation via low-rank adapters), built TPU-first:

- heatmap construction is an on-device separable rasterizer fused into the model
  input (the reference slices a (4200*r)^2 CPU template per trajectory point,
  reference: utils/image_utils.py:40-63, utils/train_epoch.py:63-78),
- the K-sample stochastic eval is a single batched jitted program
  (reference loops per sample / per person: utils/evaluate.py:147-155,248-266),
- adaptation strategies are pytree partitions + LoRA overlays instead of
  nn.Module mutation (reference: models/trainer.py:112-195),
- scaling is a jax.sharding Mesh (data x sample) instead of nothing.
"""

__version__ = "0.1.0"


def _honor_platform_env():
    """Make the JAX_PLATFORMS env var effective even when a site hook
    pre-configured the platform list.

    Some managed environments pre-import jax at interpreter start and call
    jax.config.update("jax_platforms", ...) to pin a hardware backend
    (e.g. the tunneled-TPU axon site) — which silently overrides the
    JAX_PLATFORMS env var jax would otherwise honor. Callers that export
    JAX_PLATFORMS=cpu for hermetic CLI runs (tests, the synthetic scripts
    sweep) then end up on the hardware backend anyway. Re-assert the env
    var here (the first mst_tpu import, before any backend is
    initialized); a no-op when the env var is unset or already satisfied.
    """
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    try:
        import jax

        current = jax.config.jax_platforms or ""
        # treat "axon" vs "axon,cpu" as satisfied: the site hook appends
        # the cpu host platform on purpose (host-side arrays)
        if current.split(",")[0] != want.split(",")[0]:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass  # backend already initialized or jax absent: leave as-is


_honor_platform_env()


def experiment(params, **kwargs):
    """Convenience constructor: mst_tpu.experiment(params_dict)."""
    from mst_tpu.train.trainer import Experiment

    return Experiment(params, **kwargs)


def load_config(config_filename, **overrides):
    """Convenience wrapper over mst_tpu.config.get_params."""
    from mst_tpu.config import get_params

    return get_params(config_filename=config_filename, overrides=overrides)
