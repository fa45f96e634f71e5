"""Kafka contract: the option matrices a broker-backed run would use.

No broker ships in this container, so these tests pin everything that is
pinnable without one (reference surface: faust/topics.py:94-241):
subscription-mode mapping, mutual exclusion, sink options, parallelism
floor, and the documented connector-deployment guard. The only unexercised
step is the network round trip itself.
"""

import pytest

from faust_spark import App


@pytest.fixture()
def app(spark):
    return App("kafka-contract", spark=spark, broker="broker1:9092")


def test_subscribe_single_topic(app):
    opts = app.topic("events").kafka_source_options()
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092",
        "startingOffsets": "earliest",
        "subscribe": "events",
    }


def test_subscribe_multiple_topics_comma_joined(app):
    # faust: app.topic('t1', 't2') subscribes to both
    opts = app.topic("t1", "t2", "t3").kafka_source_options("latest")
    assert opts["subscribe"] == "t1,t2,t3"
    assert opts["startingOffsets"] == "latest"


def test_subscribe_pattern(app):
    opts = app.topic(pattern="events-.*").kafka_source_options()
    assert opts["subscribePattern"] == "events-.*"
    assert "subscribe" not in opts


def test_assign_explicit_partitions(app):
    assign = '{"events": [0, 1]}'
    opts = app.topic(assign=assign).kafka_source_options()
    assert opts["assign"] == assign
    assert "subscribe" not in opts and "subscribePattern" not in opts


def test_partitions_become_min_partitions_floor(app):
    opts = app.topic("events", partitions=64).kafka_source_options()
    assert opts["minPartitions"] == "64"


def test_subscription_modes_mutually_exclusive(app):
    with pytest.raises(ValueError, match="exactly one"):
        app.topic("events", pattern="ev-.*").kafka_source_options()
    with pytest.raises(ValueError, match="exactly one"):
        app.topic(pattern="a.*", assign="{}" ).kafka_source_options()
    with pytest.raises(ValueError, match="exactly one"):
        app.topic().kafka_source_options()  # no mode at all


def test_sink_options_and_name_requirement(app):
    t = app.topic("out-topic")
    assert t.kafka_sink_options() == {
        "kafka.bootstrap.servers": "broker1:9092",
        "topic": "out-topic",
    }
    with pytest.raises(ValueError, match="concrete name"):
        app.topic(pattern="x.*").kafka_sink_options()


def test_stream_df_guard_names_deploy_recipe(app):
    """Without the connector jar the reader must fail with the documented
    --packages recipe, not an opaque classpath error."""
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        app.topic("events").stream_df()
