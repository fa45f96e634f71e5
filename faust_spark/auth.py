"""Broker authentication credentials (reference: ``faust/auth.py:15-110``).

The reference ships first-class credential objects — ``SASLCredentials``,
``GSSAPICredentials``, ``SSLCredentials`` — passed as
``app.conf.broker_credentials`` and translated by the transport into
aiokafka client settings (``faust/types/auth.py``,
``faust/transport/drivers/aiokafka.py``). The Spark-native analogue
translates the same declarations into the Kafka DataSource's ``kafka.*``
reader/writer options (``kafka.security.protocol``,
``kafka.sasl.mechanism``, ``kafka.sasl.jaas.config``, ``kafka.ssl.*``),
which Spark forwards verbatim to the underlying Kafka client on every
executor.

Design differences from the reference, by necessity:

* faust's SSL surface is a live ``ssl.SSLContext``; a Python object cannot
  cross into the JVM, so ``SSLCredentials`` here takes the *file-path*
  form the Kafka client understands (PEM CA / cert / key, or
  JKS/PKCS12 trust/key stores). This matches how every JVM Kafka client —
  and therefore every Spark deployment — is configured in practice.
* JAAS config strings are built for the standard public login modules
  (``PlainLoginModule``, ``ScramLoginModule``, ``Krb5LoginModule``) that
  ship with Apache Kafka.

Every option key emitted is a documented Apache Kafka client setting
prefixed with ``kafka.`` as the Spark connector requires; nothing here is
connector-private.
"""

from __future__ import annotations

from enum import Enum
from typing import Optional, Union

__all__ = [
    "AuthProtocol",
    "SASLMechanism",
    "Credentials",
    "SASLCredentials",
    "GSSAPICredentials",
    "SSLCredentials",
    "to_credentials",
]


class AuthProtocol(Enum):
    """Wire protocols (reference ``faust/types/auth.py:16-21``)."""

    PLAINTEXT = "PLAINTEXT"
    SSL = "SSL"
    SASL_PLAINTEXT = "SASL_PLAINTEXT"
    SASL_SSL = "SASL_SSL"


class SASLMechanism(Enum):
    """SASL mechanisms (reference ``faust/types/auth.py:23-26`` has
    PLAIN/GSSAPI; SCRAM variants are standard Kafka and added here)."""

    PLAIN = "PLAIN"
    GSSAPI = "GSSAPI"
    SCRAM_SHA_256 = "SCRAM-SHA-256"
    SCRAM_SHA_512 = "SCRAM-SHA-512"


def _jaas_escape(value: str) -> str:
    """Escape a value for inclusion inside a double-quoted JAAS literal."""
    return value.replace("\\", "\\\\").replace('"', '\\"')


class Credentials:
    """Base class (reference ``faust/auth.py:16-17``).

    Subclasses implement :meth:`kafka_options`, returning the ``kafka.*``
    option dict to merge into a source/sink option matrix.
    """

    protocol: AuthProtocol = AuthProtocol.PLAINTEXT

    def kafka_options(self) -> dict:
        return {"kafka.security.protocol": self.protocol.value}


class _SSLFiles:
    """Shared SSL file-path plumbing for SSL and SASL_SSL.

    PEM paths map to ``ssl.*.type=PEM`` + location options; JKS/PKCS12
    stores map to the classic truststore/keystore options. Mixing PEM and
    store forms on the same side is rejected (the Kafka client would
    ignore one silently).
    """

    def __init__(
        self,
        *,
        cafile: Optional[str] = None,
        certfile: Optional[str] = None,
        keyfile: Optional[str] = None,
        key_password: Optional[str] = None,
        truststore_location: Optional[str] = None,
        truststore_password: Optional[str] = None,
        truststore_type: Optional[str] = None,
        keystore_location: Optional[str] = None,
        keystore_password: Optional[str] = None,
        keystore_type: Optional[str] = None,
        endpoint_identification_algorithm: Optional[str] = None,
    ) -> None:
        if cafile and truststore_location:
            raise ValueError("pass cafile (PEM) or truststore_location, not both")
        if (certfile or keyfile) and keystore_location:
            raise ValueError(
                "pass certfile/keyfile (PEM) or keystore_location, not both"
            )
        if keyfile:
            # Kafka's PEM keystore (ssl.keystore.type=PEM +
            # ssl.keystore.location) reads the private key and cert chain
            # from ONE file; there is no separate key-location option.
            raise ValueError(
                "Kafka PEM keystores take one combined file: concatenate "
                "the private key and certificate chain into certfile="
            )
        self.cafile = cafile
        self.certfile = certfile
        self.key_password = key_password
        self.truststore_location = truststore_location
        self.truststore_password = truststore_password
        self.truststore_type = truststore_type
        self.keystore_location = keystore_location
        self.keystore_password = keystore_password
        self.keystore_type = keystore_type
        self.endpoint_identification_algorithm = endpoint_identification_algorithm

    @property
    def has_any(self) -> bool:
        return any(
            (
                self.cafile,
                self.certfile,
                self.truststore_location,
                self.keystore_location,
            )
        )

    def ssl_options(self) -> dict:
        opts: dict = {}
        if self.cafile:
            opts["kafka.ssl.truststore.type"] = "PEM"
            opts["kafka.ssl.truststore.location"] = self.cafile
        elif self.truststore_location:
            opts["kafka.ssl.truststore.location"] = self.truststore_location
            if self.truststore_password is not None:
                opts["kafka.ssl.truststore.password"] = self.truststore_password
            if self.truststore_type is not None:
                opts["kafka.ssl.truststore.type"] = self.truststore_type
        if self.certfile:
            # one combined PEM file: private key + certificate chain
            opts["kafka.ssl.keystore.type"] = "PEM"
            opts["kafka.ssl.keystore.location"] = self.certfile
            if self.key_password is not None:
                opts["kafka.ssl.key.password"] = self.key_password
        elif self.keystore_location:
            opts["kafka.ssl.keystore.location"] = self.keystore_location
            if self.keystore_password is not None:
                opts["kafka.ssl.keystore.password"] = self.keystore_password
            if self.keystore_type is not None:
                opts["kafka.ssl.keystore.type"] = self.keystore_type
            if self.key_password is not None:
                opts["kafka.ssl.key.password"] = self.key_password
        if self.endpoint_identification_algorithm is not None:
            opts[
                "kafka.ssl.endpoint.identification.algorithm"
            ] = self.endpoint_identification_algorithm
        return opts


class SSLCredentials(Credentials):
    """TLS-only brokers (reference ``faust/auth.py:82-110``).

    The reference builds an ``ssl.SSLContext`` from
    ``cafile``/``capath``/``cadata``; here the same ``cafile`` names a PEM
    CA bundle shipped to the executors, plus optional client cert/key for
    mTLS, or JKS/PKCS12 store paths for classic JVM deployments.
    """

    protocol = AuthProtocol.SSL

    def __init__(self, **ssl_files) -> None:
        self._ssl = _SSLFiles(**ssl_files)

    def kafka_options(self) -> dict:
        opts = {"kafka.security.protocol": self.protocol.value}
        opts.update(self._ssl.ssl_options())
        return opts

    def __repr__(self) -> str:  # mirrors faust/auth.py:109-110
        return f"<{type(self).__name__}: cafile={self._ssl.cafile!r}>"


class SASLCredentials(Credentials):
    """Username/password SASL (reference ``faust/auth.py:20-47``).

    ``mechanism`` defaults to PLAIN like the reference; SCRAM-SHA-256/512
    select the ScramLoginModule. Passing any SSL file upgrades the
    protocol to SASL_SSL, mirroring the reference's
    ``if ssl_context is not None: protocol = AuthProtocol.SASL_SSL``.
    """

    protocol = AuthProtocol.SASL_PLAINTEXT

    def __init__(
        self,
        *,
        username: Optional[str] = None,
        password: Optional[str] = None,
        mechanism: Union[str, SASLMechanism, None] = None,
        **ssl_files,
    ) -> None:
        self.username = username
        self.password = password
        self.mechanism = (
            SASLMechanism(mechanism)
            if mechanism is not None
            else SASLMechanism.PLAIN
        )
        if self.mechanism is SASLMechanism.GSSAPI:
            raise ValueError("use GSSAPICredentials for GSSAPI/Kerberos")
        self._ssl = _SSLFiles(**ssl_files)
        if self._ssl.has_any:
            self.protocol = AuthProtocol.SASL_SSL

    def _login_module(self) -> str:
        if self.mechanism is SASLMechanism.PLAIN:
            return "org.apache.kafka.common.security.plain.PlainLoginModule"
        return "org.apache.kafka.common.security.scram.ScramLoginModule"

    def kafka_options(self) -> dict:
        """Compile to Spark Kafka source/sink options.

        SECURITY (ADVICE r11): the password is embedded in plaintext in
        ``kafka.sasl.jaas.config``, and Spark's redaction matches option
        NAMES against ``spark.redaction.regex`` (default
        ``(?i)secret|password|token|access[.]key``) — the name
        ``kafka.sasl.jaas.config`` does not match, so the credential can
        surface unredacted in the Spark UI's SQL/Environment tabs,
        ``explain`` output, and any log that prints source options.
        Deployments handling sensitive credentials should either extend
        the redaction conf::

            spark.redaction.regex  (?i)secret|password|token|jaas

        or prefer keytab (GSSAPI) / SSL-certificate auth, which keep
        secrets in files rather than option strings. This mirrors the
        JVM Kafka client's own behavior (the JAAS string is plaintext
        there too); the divergence worth knowing is Spark's extra
        surfaces (UI/plans) that a bare consumer doesn't have.
        """
        if self.username is None or self.password is None:
            raise ValueError("SASLCredentials needs username and password")
        jaas = (
            f'{self._login_module()} required '
            f'username="{_jaas_escape(self.username)}" '
            f'password="{_jaas_escape(self.password)}";'
        )
        opts = {
            "kafka.security.protocol": self.protocol.value,
            "kafka.sasl.mechanism": self.mechanism.value,
            "kafka.sasl.jaas.config": jaas,
        }
        opts.update(self._ssl.ssl_options())
        return opts

    def __repr__(self) -> str:  # mirrors faust/auth.py:46-47
        return f"<{type(self).__name__}: username={self.username}>"


class GSSAPICredentials(Credentials):
    """Kerberos over SASL (reference ``faust/auth.py:50-79``).

    ``kerberos_service_name`` → ``sasl.kerberos.service.name``; the JAAS
    config selects Krb5LoginModule with a keytab when given, else the
    ticket cache — the two standard JVM Kerberos setups.
    """

    protocol = AuthProtocol.SASL_PLAINTEXT
    mechanism = SASLMechanism.GSSAPI

    def __init__(
        self,
        *,
        kerberos_service_name: str = "kafka",
        kerberos_domain_name: Optional[str] = None,
        keytab: Optional[str] = None,
        principal: Optional[str] = None,
        **ssl_files,
    ) -> None:
        self.kerberos_service_name = kerberos_service_name
        self.kerberos_domain_name = kerberos_domain_name
        if kerberos_domain_name is not None:
            # ADVICE r11: the reference's aiokafka client uses
            # kerberos_domain_name to build the SASL server principal
            # (service@domain); the JVM Kafka client has NO equivalent
            # setting — it always derives the domain from the broker
            # hostname. Accepting it silently would let a migrated app
            # believe a custom domain is in effect, so warn loudly
            # (kept as a parameter for API parity with faust/auth.py:50).
            import warnings

            warnings.warn(
                "GSSAPICredentials.kerberos_domain_name is accepted for "
                "reference API parity but has NO effect here: the JVM "
                "Kafka client derives the Kerberos service principal's "
                "domain from the broker hostname and exposes no override "
                "(the aiokafka-only sasl_kerberos_domain_name setting). "
                "Ensure broker hostnames resolve to the expected realm.",
                UserWarning,
                stacklevel=2,
            )
        self.keytab = keytab
        self.principal = principal
        if keytab and not principal:
            raise ValueError("keytab requires principal")
        self._ssl = _SSLFiles(**ssl_files)
        if self._ssl.has_any:
            self.protocol = AuthProtocol.SASL_SSL

    def kafka_options(self) -> dict:
        if self.keytab:
            jaas = (
                "com.sun.security.auth.module.Krb5LoginModule required "
                "useKeyTab=true storeKey=true "
                f'keyTab="{_jaas_escape(self.keytab)}" '
                f'principal="{_jaas_escape(self.principal)}";'
            )
        else:
            jaas = (
                "com.sun.security.auth.module.Krb5LoginModule required "
                "useTicketCache=true;"
            )
        opts = {
            "kafka.security.protocol": self.protocol.value,
            "kafka.sasl.mechanism": self.mechanism.value,
            "kafka.sasl.kerberos.service.name": self.kerberos_service_name,
            "kafka.sasl.jaas.config": jaas,
        }
        opts.update(self._ssl.ssl_options())
        return opts

    def __repr__(self) -> str:  # mirrors faust/auth.py:74-79
        return (
            f"<{type(self).__name__}: kerberos "
            f"service={self.kerberos_service_name!r} "
            f"domain={self.kerberos_domain_name!r}>"
        )


def to_credentials(obj) -> Optional[Credentials]:
    """Coerce (reference ``faust/types/auth.py:39-49``): Credentials pass
    through, None stays None, anything else is a configuration error."""
    if obj is None or isinstance(obj, Credentials):
        return obj
    raise TypeError(f"Unknown credentials type {type(obj).__name__}: {obj!r}")
