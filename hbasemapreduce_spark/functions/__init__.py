"""Reusable operator building blocks (the engine's "function library").

Each module here is a pure-DataFrame composition usable outside the
benchmark queries; operators/ modules are thin registrations on top.
"""
