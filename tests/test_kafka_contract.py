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


# --- auth passthrough (reference faust/auth.py:15-110 via ---------------
# --- app.conf.broker_credentials; here App(broker_credentials=...)) -----

from faust_spark import GSSAPICredentials, SASLCredentials, SSLCredentials
from faust_spark.auth import AuthProtocol, to_credentials


def _secured_app(spark, creds):
    from faust_spark import App

    return App("kafka-auth", spark=spark, broker="broker1:9093",
               broker_credentials=creds)


def test_sasl_plain_source_options(spark):
    app = _secured_app(spark, SASLCredentials(username="svc", password="pw"))
    opts = app.topic("events").kafka_source_options()
    assert opts["kafka.security.protocol"] == "SASL_PLAINTEXT"
    assert opts["kafka.sasl.mechanism"] == "PLAIN"
    assert opts["kafka.sasl.jaas.config"] == (
        "org.apache.kafka.common.security.plain.PlainLoginModule required "
        'username="svc" password="pw";'
    )
    # base matrix unchanged underneath
    assert opts["subscribe"] == "events"
    assert opts["kafka.bootstrap.servers"] == "broker1:9093"


def test_sasl_ssl_upgrade_and_scram(spark):
    # any SSL file upgrades SASL_PLAINTEXT -> SASL_SSL (faust/auth.py:39-40)
    creds = SASLCredentials(
        username="svc", password="pw",
        mechanism="SCRAM-SHA-512", cafile="/etc/kafka/ca.pem",
    )
    assert creds.protocol is AuthProtocol.SASL_SSL
    opts = _secured_app(spark, creds).topic("t").kafka_source_options()
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.mechanism"] == "SCRAM-SHA-512"
    assert "ScramLoginModule" in opts["kafka.sasl.jaas.config"]
    assert opts["kafka.ssl.truststore.type"] == "PEM"
    assert opts["kafka.ssl.truststore.location"] == "/etc/kafka/ca.pem"


def test_jaas_escaping_of_quotes_and_backslashes(spark):
    creds = SASLCredentials(username="u", password='p"w\\x')
    jaas = creds.kafka_options()["kafka.sasl.jaas.config"]
    assert 'password="p\\"w\\\\x";' in jaas


def test_ssl_credentials_pem_and_stores(spark):
    pem = SSLCredentials(cafile="/etc/ca.pem", certfile="/etc/client.pem",
                         key_password="kp")
    opts = _secured_app(spark, pem).topic("t").kafka_sink_options()
    assert opts["kafka.security.protocol"] == "SSL"
    assert opts["kafka.ssl.truststore.type"] == "PEM"
    assert opts["kafka.ssl.keystore.type"] == "PEM"
    assert opts["kafka.ssl.keystore.location"] == "/etc/client.pem"
    assert opts["kafka.ssl.key.password"] == "kp"
    assert opts["topic"] == "t"

    jks = SSLCredentials(
        truststore_location="/etc/trust.jks", truststore_password="tp",
        keystore_location="/etc/key.p12", keystore_password="ksp",
        keystore_type="PKCS12",
    )
    jopts = jks.kafka_options()
    assert jopts["kafka.ssl.truststore.location"] == "/etc/trust.jks"
    assert jopts["kafka.ssl.truststore.password"] == "tp"
    assert jopts["kafka.ssl.keystore.type"] == "PKCS12"


def test_ssl_pem_vs_store_mutually_exclusive():
    with pytest.raises(ValueError, match="not both"):
        SSLCredentials(cafile="/a.pem", truststore_location="/t.jks")
    with pytest.raises(ValueError, match="one combined file"):
        SSLCredentials(certfile="/c.pem", keyfile="/k.pem")


def test_gssapi_keytab_and_ticket_cache(spark):
    kt = GSSAPICredentials(kerberos_service_name="kafka",
                           keytab="/etc/svc.keytab",
                           principal="svc@REALM")
    opts = _secured_app(spark, kt).topic("t").kafka_source_options()
    assert opts["kafka.sasl.mechanism"] == "GSSAPI"
    assert opts["kafka.sasl.kerberos.service.name"] == "kafka"
    assert 'keyTab="/etc/svc.keytab"' in opts["kafka.sasl.jaas.config"]
    assert 'principal="svc@REALM"' in opts["kafka.sasl.jaas.config"]

    tc = GSSAPICredentials()
    assert "useTicketCache=true" in tc.kafka_options()["kafka.sasl.jaas.config"]
    with pytest.raises(ValueError, match="keytab requires principal"):
        GSSAPICredentials(keytab="/etc/svc.keytab")


def test_sasl_requires_username_password_and_rejects_gssapi():
    with pytest.raises(ValueError, match="username and password"):
        SASLCredentials(username="only-user").kafka_options()
    with pytest.raises(ValueError, match="GSSAPICredentials"):
        SASLCredentials(username="u", password="p", mechanism="GSSAPI")


def test_kafka_extra_options_passthrough_and_override(spark):
    creds = SASLCredentials(username="svc", password="pw")
    app = _secured_app(spark, creds)
    t = app.topic(
        "events",
        kafka_extra_options={
            "kafka.client.id": "pipeline-7",
            # extra options are applied LAST: may override generated ones
            "kafka.security.protocol": "SASL_SSL",
        },
    )
    src = t.kafka_source_options()
    assert src["kafka.client.id"] == "pipeline-7"
    assert src["kafka.security.protocol"] == "SASL_SSL"
    snk = t.kafka_sink_options()
    assert snk["kafka.client.id"] == "pipeline-7"

    with pytest.raises(ValueError, match="kafka\\.'-prefixed"):
        app.topic("x", kafka_extra_options={"client.id": "nope"}) \
            .kafka_source_options()


def test_to_credentials_coercion():
    c = SASLCredentials(username="u", password="p")
    assert to_credentials(c) is c
    assert to_credentials(None) is None
    with pytest.raises(TypeError, match="Unknown credentials"):
        to_credentials("ssl-please")


def test_unauthenticated_matrix_has_no_auth_keys(app):
    opts = app.topic("events").kafka_source_options()
    assert not [k for k in opts if k.startswith("kafka.s") and k != "kafka.bootstrap.servers"]


def test_gssapi_domain_name_warns_not_silently_ignored():
    """ADVICE r11: kerberos_domain_name is an aiokafka-only setting the
    JVM client cannot honor — accepting it silently would let a migrated
    app believe a custom domain is in effect. It must warn (and still
    appear in repr for faust/auth.py:74-79 parity)."""
    import warnings

    from faust_spark.auth import GSSAPICredentials

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        creds = GSSAPICredentials(
            kerberos_service_name="kafka", kerberos_domain_name="example.com"
        )
    assert any("kerberos_domain_name" in str(x.message) for x in w)
    assert "example.com" in repr(creds)
    # no domain → no warning
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        GSSAPICredentials(kerberos_service_name="kafka")
    assert not any("kerberos_domain_name" in str(x.message) for x in w)
