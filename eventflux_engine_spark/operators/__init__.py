"""Composable operator builders (DataFrame -> DataFrame).

Each builder mirrors one reference operator family (SURVEY.md §2) but is
expressed declaratively so Catalyst keeps pushdown/pruning/codegen.
"""
