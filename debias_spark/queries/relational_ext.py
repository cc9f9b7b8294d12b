"""Relational extension operators (SURVEY §2.H: H1-H6, H11-H13, H17).

Filled in milestone M3.
"""
