"""Event-time window + streaming operators (SURVEY §2.H: H14-H16).

Filled in milestone M5.
"""
