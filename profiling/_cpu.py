"""Import first in scratch scripts to force the CPU backend."""
import jax
jax.config.update("jax_platforms", "cpu")
