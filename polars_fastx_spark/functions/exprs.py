"""Expression-level utilities shared across operators.

``let`` is the load-bearing one: Spark inlines a referenced Column
expression at EVERY use site — there is no common-subexpression
elimination across higher-order-function lambdas — so an expression
used inside a per-element ``transform`` lambda re-evaluates once PER
ELEMENT. For an O(len) input expression that turns a row-local O(len)
scan into O(len²) per row (measured: the 6-frame ORF scan 137 s → ~6 s
at sf0.1, winnowing 80 s → seconds). Binding the value through a
1-element array + ``transform`` lambda evaluates it exactly once and
hands the lambda a cheap variable reference — the relational ``let``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """``let x = value in body(x)`` for Column expressions: ``value``
    evaluates once per row; ``body`` receives the bound variable."""
    return F.element_at(F.transform(F.array(value), body), 1)
