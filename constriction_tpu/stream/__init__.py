"""Stream codes: rANS (stack), range coding (queue), chain coding (bits-back).

API parity with `constriction.stream`
(/root/reference/src/pybindings/stream/mod.rs:50-58).
"""

from . import chain, model, queue, stack

__all__ = ["model", "stack", "queue", "chain"]
