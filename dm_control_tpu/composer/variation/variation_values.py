"""Variation evaluation helper.

Reference counterpart: dm_control/composer/variation/variation_values.py
(`evaluate` maps over arbitrarily nested structures of callables or
constants). Here we traverse lists, tuples, namedtuples and dicts with
plain recursion instead of dm-tree.
"""


def evaluate(structure, initial_value=None, current_value=None,
             random_state=None):
  """Recursively evaluates callables in a nested structure."""
  if callable(structure):
    return structure(initial_value, current_value, random_state)
  if isinstance(structure, dict):
    return type(structure)(
        (k, evaluate(v, initial_value, current_value, random_state))
        for k, v in structure.items())
  if isinstance(structure, tuple):
    evaluated = [evaluate(v, initial_value, current_value, random_state)
                 for v in structure]
    if hasattr(structure, '_fields'):  # namedtuple
      return type(structure)(*evaluated)
    return type(structure)(evaluated)
  if isinstance(structure, list):
    return [evaluate(v, initial_value, current_value, random_state)
            for v in structure]
  return structure
