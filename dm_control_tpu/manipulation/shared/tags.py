"""String constants used to annotate task constructors
(reference manipulation/shared/tags.py)."""

FEATURES = 'features'
VISION = 'vision'
EASY = 'easy'
