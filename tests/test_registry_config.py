import os
import textwrap

import pytest

from visualdet3d_tpu.config import EasyDict, cfg_from_file
from visualdet3d_tpu.registry import Registry


def test_registry_decorator_and_lookup():
    REG = Registry('test')

    @REG.register_module
    class Foo:
        pass

    @REG.register_module(name='bar_alias')
    def bar():
        return 42

    assert REG['Foo'] is Foo
    assert REG['bar_alias']() == 42
    assert 'Foo' in REG
    assert len(REG) == 2
    with pytest.raises(KeyError):
        REG['missing']
    with pytest.raises(KeyError):
        REG.register_module(Foo)  # duplicate


def test_registry_build_from_cfg():
    REG = Registry('test')

    @REG.register_module
    class Thing:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    cfg = EasyDict(type_name='Thing', keywords=EasyDict(a=1))
    t = REG.build(cfg, b=5)
    assert (t.a, t.b) == (1, 5)


def test_easydict_nested_attribute_access():
    d = EasyDict({'a': {'b': {'c': 1}}, 'lst': [{'x': 2}]})
    assert d.a.b.c == 1
    assert d.lst[0].x == 2
    d.new = {'k': 3}
    assert d.new.k == 3
    d.update({'u': {'v': 4}})
    assert d.u.v == 4


def test_cfg_from_file(tmp_path):
    cfg_file = tmp_path / 'mycfg.py'
    cfg_file.write_text(textwrap.dedent('''
        from visualdet3d_tpu.config import EasyDict as edict
        cfg = edict()
        cfg.obj_types = ['Car']
        cfg.trainer = edict(max_epochs=30)
    '''))
    cfg = cfg_from_file(str(cfg_file))
    assert cfg.obj_types == ['Car']
    assert cfg.trainer.max_epochs == 30
