"""Composable DataFrame operators — each a small ``DataFrame -> DataFrame``
function, unit- and oracle-tested (SURVEY.md §7.1b)."""
