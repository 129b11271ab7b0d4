"""Filesystem resource shims (reference dm_control/utils/io.py)."""

from __future__ import annotations

import os


def GetResource(name, mode='rb'):
  with open(name, mode=mode) as f:
    return f.read()


def GetResourceFilename(name, mode='rb'):
  del mode
  return name


def WalkResources(path):
  return os.walk(path)


GetResourceAsFile = open
