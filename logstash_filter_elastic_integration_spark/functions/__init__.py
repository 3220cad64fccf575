"""Scalar/extraction function library backing the operators.

Everything here is driver-side compilation logic (grok/dissect pattern ->
regex, painless-subset -> Column) or pure helpers used inside vectorized
pandas UDFs.  No per-row Python ever crosses the executor boundary.
"""

from .grok import GrokCompiler, GROK_PATTERNS  # noqa: F401
from .dissect import compile_dissect  # noqa: F401
from .painless import compile_condition, compile_script  # noqa: F401
