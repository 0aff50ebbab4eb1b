"""Interval algebra tests (kel_utility/kel_interval_type.h parity)."""

import pytest

from kgl_gene_tpu.utils import IntervalSet, OpenRightInterval


class TestOpenRightInterval:
    def test_basic(self):
        iv = OpenRightInterval(2, 5)
        assert iv.size == 3
        assert 2 in iv and 4 in iv and 5 not in iv
        assert not iv.empty()
        assert OpenRightInterval(3, 3).empty()

    def test_invalid(self):
        with pytest.raises(ValueError):
            OpenRightInterval(5, 2)

    def test_relations(self):
        a = OpenRightInterval(0, 10)
        b = OpenRightInterval(5, 15)
        c = OpenRightInterval(10, 20)
        assert a.intersects(b)
        assert not a.intersects(c)
        assert a.adjacent(c)
        assert a.intersection(b) == OpenRightInterval(5, 10)
        assert a.merge(b) == OpenRightInterval(0, 15)
        assert a.merge(c) == OpenRightInterval(0, 20)
        with pytest.raises(ValueError):
            a.merge(OpenRightInterval(30, 40))
        assert a.contains_interval(OpenRightInterval(2, 8))
        assert not a.contains_interval(b)
        assert a.translate(5) == OpenRightInterval(5, 15)

    def test_empty_containment(self):
        a = OpenRightInterval(0, 10)
        assert a.contains_interval(OpenRightInterval(10, 10))
        assert not a.contains_interval(OpenRightInterval(11, 11))


class TestIntervalSet:
    def test_queries(self):
        ivs = IntervalSet(
            [OpenRightInterval(0, 5), OpenRightInterval(10, 20), OpenRightInterval(15, 25)]
        )
        assert len(ivs) == 3
        assert OpenRightInterval(10, 20) in ivs
        assert ivs.containing_point(12) == [OpenRightInterval(10, 20)]
        assert set(ivs.intersecting(OpenRightInterval(16, 18))) == {
            OpenRightInterval(10, 20),
            OpenRightInterval(15, 25),
        }
        assert ivs.containing(OpenRightInterval(11, 19)) == OpenRightInterval(10, 20)
        assert ivs.containing(OpenRightInterval(3, 12)) is None

    def test_union_size(self):
        ivs = IntervalSet([OpenRightInterval(0, 5), OpenRightInterval(3, 8), OpenRightInterval(10, 12)])
        assert ivs.union_size() == 10
