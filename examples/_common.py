import os, sys

# Default examples to CPU: the environment pins JAX_PLATFORMS to the (single
# client) TPU, and a sitecustomize pre-imports jax, so both the env var and
# the config must be forced.  Set WEBAUDIO_PLATFORM=axon to run on the TPU.
platform = os.environ.get("WEBAUDIO_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = platform
import jax

jax.config.update("jax_platforms", platform)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
