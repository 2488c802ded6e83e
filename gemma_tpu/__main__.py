import os

# Backend override must land before any JAX backend initialisation.
# The axon TPU plugin ignores JAX_PLATFORMS, so honour our own env var
# via the config API (CLAUDE.md): GEMMA_TPU_PLATFORM=cpu forces the
# CPU backend — for air-gapped verification, tests, or when the TPU
# tunnel is unavailable.
_plat = os.environ.get("GEMMA_TPU_PLATFORM")
if _plat:
    # belt and braces: the plugin consults the env var during backend
    # registration and jax the config — setting only one still lets
    # the axon client initialise (and hang when the tunnel is down)
    os.environ["JAX_PLATFORMS"] = _plat
    import jax

    jax.config.update("jax_platforms", _plat)

from gemma_tpu.cli import main

main()
