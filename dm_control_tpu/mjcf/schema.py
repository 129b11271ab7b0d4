"""Element schema for the MJCF object model.

Unlike the reference (which parses a 3,200-line schema.xml at import —
dm_control/mjcf/schema.py:73-196), the schema here is declared directly
in Python for the element kinds the TPU stack supports, and is extended
as the compiler grows. Structure per element kind:

    'element': {
        'attributes': {name: (kind, default)},
        'children': (child kinds...),
        'repeatable': bool,
        'identifier': namespace or None,
        'namespace': reference namespace for *-name attributes,
    }

Attribute kinds: str, float, int, bool, array (whitespace floats),
keyword, identifier (this element's name), reference:<namespace>.
"""

from __future__ import annotations

_BODY_CHILDREN = ('body', 'joint', 'freejoint', 'geom', 'site',
                  'camera', 'light', 'inertial')

_COMMON_GEOM_ATTRS = {
    'name': ('identifier', None),
    'class': ('reference:default', None),
    'type': ('keyword', 'sphere'),
    'pos': ('array', None),
    'quat': ('array', None),
    'euler': ('array', None),
    'axisangle': ('array', None),
    'zaxis': ('array', None),
    'xyaxes': ('array', None),
    'fromto': ('array', None),
    'size': ('array', None),
    'contype': ('int', None),
    'conaffinity': ('int', None),
    'condim': ('int', None),
    'priority': ('int', None),
    'group': ('int', None),
    'friction': ('array', None),
    'solref': ('array', None),
    'solimp': ('array', None),
    'solmix': ('float', None),
    'margin': ('float', None),
    'gap': ('float', None),
    'mass': ('float', None),
    'density': ('float', None),
    'material': ('reference:material', None),
    'rgba': ('array', None),
    'hfield': ('reference:hfield', None),
    'mesh': ('reference:mesh', None),
}

_JOINT_ATTRS = {
    'name': ('identifier', None),
    'class': ('reference:default', None),
    'type': ('keyword', 'hinge'),
    'pos': ('array', None),
    'axis': ('array', None),
    'range': ('array', None),
    'limited': ('keyword', None),
    'stiffness': ('float', None),
    'damping': ('float', None),
    'armature': ('float', None),
    'frictionloss': ('float', None),
    'springref': ('float', None),
    'ref': ('float', None),
    'solreflimit': ('array', None),
    'solimplimit': ('array', None),
    'margin': ('float', None),
}

_ACTUATOR_COMMON = {
    'name': ('identifier', None),
    'class': ('reference:default', None),
    'joint': ('reference:joint', None),
    'tendon': ('reference:tendon', None),
    'site': ('reference:site', None),
    'gear': ('array', None),
    'ctrllimited': ('keyword', None),
    'ctrlrange': ('array', None),
    'forcelimited': ('keyword', None),
    'forcerange': ('array', None),
}

SCHEMA = {
    'mujoco': {
        'attributes': {'model': ('str', 'unnamed')},
        'children': ('compiler', 'option', 'size', 'default', 'asset',
                     'worldbody', 'contact', 'equality', 'tendon',
                     'actuator', 'sensor', 'keyframe', 'visual',
                     'statistic', 'custom'),
        'repeatable': False, 'identifier': None,
    },
    'compiler': {
        'attributes': {
            'angle': ('keyword', 'degree'),
            'eulerseq': ('str', 'xyz'),
            'settotalmass': ('float', None),
            'boundmass': ('float', None),
            'boundinertia': ('float', None),
            'balanceinertia': ('bool', None),
            'autolimits': ('bool', None),
            'inertiafromgeom': ('keyword', 'auto'),
            'coordinate': ('keyword', 'local'),
            'meshdir': ('str', None),
            'texturedir': ('str', None),
        },
        'children': (), 'repeatable': False, 'identifier': None,
    },
    'option': {
        'attributes': {
            'timestep': ('float', 0.002),
            'gravity': ('array', None),
            'wind': ('array', None),
            'density': ('float', None),
            'viscosity': ('float', None),
            'impratio': ('float', None),
            'integrator': ('keyword', 'Euler'),
            'cone': ('keyword', 'pyramidal'),
            'iterations': ('int', None),
            'ls_iterations': ('int', None),
            'tolerance': ('float', None),
            'solver': ('keyword', 'Newton'),
        },
        'children': ('flag',), 'repeatable': False, 'identifier': None,
    },
    'flag': {
        'attributes': {
            k: ('keyword', None) for k in
            ('contact', 'constraint', 'equality', 'limit', 'gravity',
             'passive', 'actuation', 'clampctrl', 'frictionloss',
             'energy', 'filterparent', 'refsafe', 'warmstart',
             'override', 'sensor')},
        'children': (), 'repeatable': False, 'identifier': None,
    },
    'size': {
        'attributes': {'njmax': ('int', None), 'nconmax': ('int', None),
                       'nstack': ('int', None),
                       'nuser_body': ('int', None)},
        'children': (), 'repeatable': False, 'identifier': None,
    },
    'statistic': {
        'attributes': {'extent': ('float', None),
                       'center': ('array', None),
                       'meansize': ('float', None)},
        'children': (), 'repeatable': False, 'identifier': None,
    },
    'visual': {
        'attributes': {}, 'children': ('headlight', 'map', 'quality',
                                       'scale', 'rgba', 'global'),
        'repeatable': False, 'identifier': None,
    },
    'headlight': {'attributes': {'ambient': ('array', None),
                                 'diffuse': ('array', None),
                                 'specular': ('array', None)},
                  'children': (), 'repeatable': False,
                  'identifier': None},
    'map': {'attributes': {'znear': ('float', None),
                           'zfar': ('float', None),
                           'shadowclip': ('float', None)},
            'children': (), 'repeatable': False, 'identifier': None},
    'quality': {'attributes': {'shadowsize': ('int', None)},
                'children': (), 'repeatable': False,
                'identifier': None},
    'scale': {'attributes': {}, 'children': (), 'repeatable': False,
              'identifier': None},
    'rgba': {'attributes': {}, 'children': (), 'repeatable': False,
             'identifier': None},
    'global': {'attributes': {}, 'children': (), 'repeatable': False,
               'identifier': None},
    'asset': {
        'attributes': {},
        'children': ('texture', 'material', 'mesh', 'hfield', 'skin'),
        'repeatable': False, 'identifier': None,
    },
    'texture': {
        'attributes': {
            'name': ('identifier', None), 'type': ('keyword', '2d'),
            'builtin': ('keyword', None), 'rgb1': ('array', None),
            'rgb2': ('array', None), 'width': ('int', None),
            'height': ('int', None), 'mark': ('keyword', None),
            'markrgb': ('array', None), 'file': ('file', None),
            'random': ('float', None),
        },
        'children': (), 'repeatable': True, 'identifier': 'texture',
    },
    'material': {
        'attributes': {
            'name': ('identifier', None),
            'texture': ('reference:texture', None),
            'texrepeat': ('array', None), 'texuniform': ('bool', None),
            'reflectance': ('float', None), 'rgba': ('array', None),
            'emission': ('float', None), 'specular': ('float', None),
            'shininess': ('float', None),
        },
        'children': (), 'repeatable': True, 'identifier': 'material',
    },
    'mesh': {
        'attributes': {'name': ('identifier', None),
                       'file': ('file', None), 'scale': ('array', None),
                       'vertex': ('array', None)},
        'children': (), 'repeatable': True, 'identifier': 'mesh',
    },
    'hfield': {
        'attributes': {'name': ('identifier', None),
                       'size': ('array', None), 'nrow': ('int', None),
                       'ncol': ('int', None), 'file': ('file', None)},
        'children': (), 'repeatable': True, 'identifier': 'hfield',
    },
    'skin': {
        'attributes': {'name': ('identifier', None),
                       'file': ('file', None)},
        'children': (), 'repeatable': True, 'identifier': 'skin',
    },
    'default': {
        'attributes': {'class': ('identifier', None)},
        'children': ('default', 'joint', 'geom', 'site', 'camera',
                     'light', 'pair', 'equality', 'tendon', 'general',
                     'motor', 'position', 'velocity', 'mesh'),
        'repeatable': True, 'identifier': 'default',
    },
    'worldbody': {
        'attributes': {},
        'children': _BODY_CHILDREN,
        'repeatable': False, 'identifier': None,
    },
    'body': {
        'attributes': {
            'name': ('identifier', None), 'pos': ('array', None),
            'quat': ('array', None), 'euler': ('array', None),
            'axisangle': ('array', None), 'zaxis': ('array', None),
            'xyaxes': ('array', None), 'childclass': (
                'reference:default', None),
            'mocap': ('bool', None), 'gravcomp': ('float', None),
        },
        'children': _BODY_CHILDREN,
        'repeatable': True, 'identifier': 'body',
    },
    'inertial': {
        'attributes': {'pos': ('array', None), 'quat': ('array', None),
                       'mass': ('float', None),
                       'diaginertia': ('array', None),
                       'fullinertia': ('array', None)},
        'children': (), 'repeatable': False, 'identifier': None,
    },
    'joint': {'attributes': _JOINT_ATTRS, 'children': (),
              'repeatable': True, 'identifier': 'joint'},
    'freejoint': {'attributes': {'name': ('identifier', None)},
                  'children': (), 'repeatable': False,
                  'identifier': 'joint'},
    'geom': {'attributes': _COMMON_GEOM_ATTRS, 'children': (),
             'repeatable': True, 'identifier': 'geom'},
    'site': {
        'attributes': {
            'name': ('identifier', None),
            'class': ('reference:default', None),
            'type': ('keyword', 'sphere'), 'pos': ('array', None),
            'quat': ('array', None), 'euler': ('array', None),
            'zaxis': ('array', None), 'xyaxes': ('array', None),
            'fromto': ('array', None), 'size': ('array', None),
            'group': ('int', None), 'rgba': ('array', None),
            'material': ('reference:material', None),
        },
        'children': (), 'repeatable': True, 'identifier': 'site',
    },
    'camera': {
        'attributes': {
            'name': ('identifier', None), 'mode': ('keyword', 'fixed'),
            'target': ('reference:body', None), 'pos': ('array', None),
            'quat': ('array', None), 'euler': ('array', None),
            'zaxis': ('array', None), 'xyaxes': ('array', None),
            'fovy': ('float', None),
        },
        'children': (), 'repeatable': True, 'identifier': 'camera',
    },
    'light': {
        'attributes': {
            'name': ('identifier', None), 'pos': ('array', None),
            'dir': ('array', None), 'directional': ('bool', None),
            'diffuse': ('array', None), 'specular': ('array', None),
            'ambient': ('array', None), 'mode': ('keyword', None),
            'castshadow': ('bool', None),
        },
        'children': (), 'repeatable': True, 'identifier': 'light',
    },
    'contact': {
        'attributes': {}, 'children': ('pair', 'exclude'),
        'repeatable': False, 'identifier': None,
    },
    'pair': {
        'attributes': {
            'name': ('identifier', None),
            'geom1': ('reference:geom', None),
            'geom2': ('reference:geom', None),
            'condim': ('int', None), 'friction': ('array', None),
            'solref': ('array', None), 'solimp': ('array', None),
            'margin': ('float', None), 'gap': ('float', None),
        },
        'children': (), 'repeatable': True, 'identifier': 'pair',
    },
    'exclude': {
        'attributes': {'name': ('identifier', None),
                       'body1': ('reference:body', None),
                       'body2': ('reference:body', None)},
        'children': (), 'repeatable': True, 'identifier': 'exclude',
    },
    'equality': {
        'attributes': {},
        'children': ('connect', 'weld', 'joint', 'tendon'),
        'repeatable': False, 'identifier': None,
    },
    'connect': {
        'attributes': {
            'name': ('identifier', None),
            'body1': ('reference:body', None),
            'body2': ('reference:body', None),
            'anchor': ('array', None), 'active': ('bool', None),
            'solref': ('array', None), 'solimp': ('array', None),
        },
        'children': (), 'repeatable': True, 'identifier': 'equality',
    },
    'weld': {
        'attributes': {
            'name': ('identifier', None),
            'body1': ('reference:body', None),
            'body2': ('reference:body', None),
            'relpose': ('array', None), 'active': ('bool', None),
            'torquescale': ('float', None),
            'solref': ('array', None), 'solimp': ('array', None),
        },
        'children': (), 'repeatable': True, 'identifier': 'equality',
    },
    'tendon': {
        'attributes': {},
        'children': ('fixed', 'spatial'),
        'repeatable': False, 'identifier': None,
    },
    'fixed': {
        'attributes': {
            'name': ('identifier', None),
            'class': ('reference:default', None),
            'limited': ('keyword', None), 'range': ('array', None),
            'stiffness': ('float', None), 'damping': ('float', None),
            'springlength': ('array', None),
            'solreflimit': ('array', None),
            'solimplimit': ('array', None),
        },
        'children': ('joint',), 'repeatable': True,
        'identifier': 'tendon',
    },
    'spatial': {
        'attributes': {
            'name': ('identifier', None),
            'class': ('reference:default', None),
            'limited': ('keyword', None), 'range': ('array', None),
            'width': ('float', None), 'stiffness': ('float', None),
            'damping': ('float', None), 'springlength': ('array', None),
            'solreflimit': ('array', None),
            'solimplimit': ('array', None),
        },
        'children': ('site', 'geom', 'pulley'),
        'repeatable': True, 'identifier': 'tendon',
    },
    'actuator': {
        'attributes': {},
        'children': ('motor', 'position', 'velocity', 'general',
                     'intvelocity', 'damper', 'cylinder', 'muscle'),
        'repeatable': False, 'identifier': None,
    },
    'motor': {'attributes': dict(_ACTUATOR_COMMON), 'children': (),
              'repeatable': True, 'identifier': 'actuator'},
    'position': {'attributes': {**_ACTUATOR_COMMON,
                                'kp': ('float', None),
                                'kv': ('float', None)},
                 'children': (), 'repeatable': True,
                 'identifier': 'actuator'},
    'velocity': {'attributes': {**_ACTUATOR_COMMON,
                                'kv': ('float', None)},
                 'children': (), 'repeatable': True,
                 'identifier': 'actuator'},
    'general': {
        'attributes': {**_ACTUATOR_COMMON,
                       'dyntype': ('keyword', None),
                       'gaintype': ('keyword', None),
                       'biastype': ('keyword', None),
                       'dynprm': ('array', None),
                       'gainprm': ('array', None),
                       'biasprm': ('array', None),
                       'actrange': ('array', None),
                       'actlimited': ('keyword', None)},
        'children': (), 'repeatable': True, 'identifier': 'actuator',
    },
    'sensor': {
        'attributes': {},
        'children': ('touch', 'accelerometer', 'velocimeter', 'gyro',
                     'force', 'torque', 'jointpos', 'jointvel',
                     'tendonpos', 'tendonvel', 'actuatorpos',
                     'actuatorvel', 'actuatorfrc', 'framepos',
                     'framequat', 'framexaxis', 'frameyaxis',
                     'framezaxis', 'framelinvel', 'frameangvel',
                     'subtreecom', 'subtreelinvel', 'subtreeangmom',
                     'magnetometer', 'ballquat', 'ballangvel', 'clock'),
        'repeatable': False, 'identifier': None,
    },
    'keyframe': {
        'attributes': {}, 'children': ('key',),
        'repeatable': False, 'identifier': None,
    },
    'key': {
        'attributes': {'name': ('identifier', None),
                       'qpos': ('array', None), 'qvel': ('array', None),
                       'ctrl': ('array', None),
                       'time': ('float', None)},
        'children': (), 'repeatable': True, 'identifier': 'key',
    },
    'custom': {'attributes': {}, 'children': (), 'repeatable': False,
               'identifier': None},
    'pulley': {'attributes': {'divisor': ('float', None)},
               'children': (), 'repeatable': True, 'identifier': None},
}

# sensor elements share one attribute shape
for _s in ('touch', 'accelerometer', 'velocimeter', 'gyro', 'force',
           'torque', 'magnetometer'):
  SCHEMA[_s] = {
      'attributes': {'name': ('identifier', None),
                     'site': ('reference:site', None),
                     'cutoff': ('float', None)},
      'children': (), 'repeatable': True, 'identifier': 'sensor'}
for _s in ('jointpos', 'jointvel', 'ballquat', 'ballangvel'):
  SCHEMA[_s] = {
      'attributes': {'name': ('identifier', None),
                     'joint': ('reference:joint', None),
                     'cutoff': ('float', None)},
      'children': (), 'repeatable': True, 'identifier': 'sensor'}
for _s in ('tendonpos', 'tendonvel'):
  SCHEMA[_s] = {
      'attributes': {'name': ('identifier', None),
                     'tendon': ('reference:tendon', None),
                     'cutoff': ('float', None)},
      'children': (), 'repeatable': True, 'identifier': 'sensor'}
for _s in ('actuatorpos', 'actuatorvel', 'actuatorfrc'):
  SCHEMA[_s] = {
      'attributes': {'name': ('identifier', None),
                     'actuator': ('reference:actuator', None),
                     'cutoff': ('float', None)},
      'children': (), 'repeatable': True, 'identifier': 'sensor'}
for _s in ('framepos', 'framequat', 'framexaxis', 'frameyaxis',
           'framezaxis', 'framelinvel', 'frameangvel'):
  SCHEMA[_s] = {
      'attributes': {'name': ('identifier', None),
                     'objtype': ('keyword', None),
                     # cross-namespace reference; the attachment prefix
                     # applies regardless of the referenced namespace
                     'objname': ('reference:any', None),
                     'cutoff': ('float', None)},
      'children': (), 'repeatable': True, 'identifier': 'sensor'}
for _s in ('subtreecom', 'subtreelinvel', 'subtreeangmom'):
  SCHEMA[_s] = {
      'attributes': {'name': ('identifier', None),
                     'body': ('reference:body', None),
                     'cutoff': ('float', None)},
      'children': (), 'repeatable': True, 'identifier': 'sensor'}
SCHEMA['clock'] = {
    'attributes': {'name': ('identifier', None),
                   'cutoff': ('float', None)},
    'children': (), 'repeatable': True, 'identifier': 'sensor'}

# tendon sub-elements reuse names 'joint'/'site'/'geom' with different
# attribute sets; the element tree disambiguates by parent kind.
TENDON_JOINT_ATTRS = {'joint': ('reference:joint', None),
                      'coef': ('float', None)}
TENDON_SITE_ATTRS = {'site': ('reference:site', None)}
TENDON_GEOM_ATTRS = {'geom': ('reference:geom', None),
                     'sidesite': ('reference:site', None)}

FINDABLE_NAMESPACES = ('body', 'joint', 'geom', 'site', 'camera',
                       'light', 'actuator', 'tendon', 'sensor',
                       'texture', 'material', 'mesh', 'hfield',
                       'equality', 'key', 'default', 'pair', 'exclude')


# ---------------------------------------------------------------------------
# Full-grammar merge: the generated module (tools/gen_schema.py, from
# the MJCF spec's 214 element kinds) fills every kind and attribute the
# curated declarations above don't cover. Curated entries win on
# conflict — they encode what the TPU compiler actually consumes.
# ---------------------------------------------------------------------------

from dm_control_tpu.mjcf import schema_full as _full  # noqa: E402

NUM_SCHEMA_ELEMENTS = _full.NUM_SCHEMA_ELEMENTS
VALID_VALUES = _full.VALID_VALUES
ARRAY_SIZES = _full.ARRAY_SIZES

for _tag, _entry in _full.FULL_SCHEMA.items():
  if _tag not in SCHEMA:
    SCHEMA[_tag] = {
        'attributes': dict(_entry['attributes']),
        'children': tuple(_entry['children']),
        'repeatable': _entry['repeatable'],
        'identifier': _entry['identifier'],
    }
  else:
    _cur = SCHEMA[_tag]
    for _a, _spec in _entry['attributes'].items():
      _cur['attributes'].setdefault(_a, _spec)
    _extra = tuple(c for c in _entry['children']
                   if c not in _cur['children'])
    if _extra:
      _cur['children'] = tuple(_cur['children']) + _extra
