from .chacha20 import chacha20_jnp, chacha20_np, make_states
from .csprng import Csprng
from .discrete_gaussian import build_CDT_binary_search_tree

__all__ = [
    "Csprng",
    "chacha20_jnp",
    "chacha20_np",
    "make_states",
    "build_CDT_binary_search_tree",
]
