"""Parallelism: mesh construction and GSPMD partition specs."""
