"""awebox_tpu: a TPU-native modeling and optimal control framework for
airborne-wind-energy multi-kite systems.

Capability-equivalent re-design of rcleuthold/awebox on the JAX/XLA stack:
Lagrangian multi-kite dynamics as pure JAX functions over static pytree
layouts, Radau direct collocation assembled with vmap over intervals, a
from-scratch batched primal-dual interior-point solver (replacing
IPOPT + MA57), and a declarative homotopy driver — all jit-compiled and
vmappable across wind scenarios.
"""

from .arch import Architecture
from .options.options import Options
from .options.kite_data import ampyx_data, boeing747_data, bubbledancer_data

__version__ = '0.1.0'

__all__ = ['Architecture', 'Options', 'Trial', 'Sweep',
           'ampyx_data', 'boeing747_data', 'bubbledancer_data']


def __getattr__(name):
    # lazy imports to keep `import awebox_tpu` light
    if name == 'Trial':
        from .api.trial import Trial
        return Trial
    if name == 'Sweep':
        from .api.sweep import Sweep
        return Sweep
    if name == 'Pmpc':
        from .api.pmpc import Pmpc
        return Pmpc
    if name == 'sim':
        from .api import sim
        return sim
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
