"""EventFlux-dialect SQL front end.

≙ reference SQL lifecycle (SURVEY.md §3.1): SQL string → analyzed plan →
runtime. Here the "compiler" is a thin translator: standard clauses pass
through to Spark SQL (Catalyst does analysis/optimization), EventFlux
extensions — ``WINDOW('type', ...)``, ``FROM PATTERN (...)``, time-unit
literals, ``OUTPUT FIRST|LAST EVERY n EVENTS`` — compile to the engine's
DataFrame builders.
"""

from .app import EventFluxApp

__all__ = ["EventFluxApp"]
