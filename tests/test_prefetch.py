"""Pipeline prefetcher: ordering, exception propagation, laziness depth."""
import time

from minimap2_chaindp_tpu.utils.prefetch import prefetch


def test_order_and_completeness():
    assert list(prefetch(range(100), depth=3)) == list(range(100))


def test_exception_propagation():
    def gen():
        yield 1
        raise ValueError("boom")
    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    try:
        next(it)
        assert False
    except ValueError as e:
        assert str(e) == "boom"


def test_overlap():
    """Producer runs ahead while the consumer is busy."""
    produced = []

    def gen():
        for i in range(4):
            produced.append(i)
            yield i
    it = prefetch(gen(), depth=2)
    first = next(it)
    time.sleep(0.05)  # let the producer fill the queue
    assert first == 0 and len(produced) >= 3
    assert list(it) == [1, 2, 3]
