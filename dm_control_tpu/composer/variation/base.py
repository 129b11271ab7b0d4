"""Variation base type (contract: reference composer/variation/base.py).

The DSL core lives in `_expr`; `Variation` is the Expr node class and all
arithmetic/indexing behavior is installed there from one operator table.
"""

from dm_control_tpu.composer.variation._expr import Ctx
from dm_control_tpu.composer.variation._expr import Expr
from dm_control_tpu.composer.variation._expr import resolve
from dm_control_tpu.composer.variation._expr import Variation

__all__ = ['Ctx', 'Expr', 'Variation', 'resolve']
