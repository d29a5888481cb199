"""Operator library — each module is a family from SURVEY.md §2.

All operators are pure ``DataFrame -> DataFrame`` functions (composable
via ``DataFrame.transform``), lazy end-to-end: no mid-plan ``collect``/
``toPandas`` (the reference's main scaling anti-pattern, SURVEY §4).
"""
