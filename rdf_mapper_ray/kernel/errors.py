"""Error taxonomy mirroring the reference's skip-vs-fail semantics.

Reference: /root/reference/src/rdf_mapper/lib/errors.py:1-8 — a missing
variable is a *warning* (the property is skipped, the row continues),
while a bad function/pattern is a ValueError (the property is skipped and
counted as an error; fatal under abort-on-error).
"""


class PatternError(Exception):
    """A template pattern could not be parsed or a function is unknown."""


class MissingValue(RuntimeWarning):
    """A referenced variable has no value in the row context.

    Raising this skips the current property without counting an error
    (reference: template_support.py:315-316).
    """
