package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog._
import graft.mesh.MeshSession

/** Principal model fidelity vs the reference user contract
  * (`core/src/model/user.rs`, `core/src/pki/mod.rs`,
  * `core/src/execute/utils.rs:59-124`): fingerprint derivation from real
  * certificates, upsert-by-fingerprint, attribute gating, requester
  * classification with the exact rejection messages, and
  * fingerprint-keyed ACL enforcement end-to-end through a mesh query. */
class PrincipalSpec extends AnyFunSuite {

  lazy val spark = TestSessions.spark

  // openssl-generated fixtures: CN=alice/O=GraftTest and
  // CN=relay-na/O=GraftMesh self-signed RSA certs
  private val alicePem =
    """-----BEGIN CERTIFICATE-----
      |MIIDQzCCAiugAwIBAgIUS7P9aRUyZ5JX2XrjfgMS4e8YGrUwDQYJKoZIhvcNAQEL
      |BQAwMTEOMAwGA1UEAwwFYWxpY2UxEjAQBgNVBAoMCUdyYWZ0VGVzdDELMAkGA1UE
      |BhMCVVMwHhcNMjYwODEzMjMxODUwWhcNMzYwODEwMjMxODUwWjAxMQ4wDAYDVQQD
      |DAVhbGljZTESMBAGA1UECgwJR3JhZnRUZXN0MQswCQYDVQQGEwJVUzCCASIwDQYJ
      |KoZIhvcNAQEBBQADggEPADCCAQoCggEBAKv3UuRuqjeaLQK43Nj/o+aq7MXpUN35
      |so9fNH4e95MA7cS5SwhJSsE/Lpr+zLOKdpjMUlFkONSUrT4z7+jA5y0W9BYDkscU
      |iltGfRx/tq2x99OHmkNo3uZBJjmbNfbHADVhDp/5rrIg3r0nT7fRnVLRVXm5Oa1t
      |xPXIDoa5QvEAgNAwhVCX4t6p58sobXBBhnFkvjJJXpU8gTgV9P6vWnOSTTCr9Bfh
      |298nPUSxBpKcriPmTBJqV7Gpxkrla0eLDu2QA9OHGX3kSXvsktxeDkA6VbjDusyJ
      |soMgfyTNx82qNyIIrpDE94Xu5BoRQkzn65mYaYDVie9r5hEcvfFWaXMCAwEAAaNT
      |MFEwHQYDVR0OBBYEFBbD2FxCkwGsrFef6ap+LGIH0QFyMB8GA1UdIwQYMBaAFBbD
      |2FxCkwGsrFef6ap+LGIH0QFyMA8GA1UdEwEB/wQFMAMBAf8wDQYJKoZIhvcNAQEL
      |BQADggEBAGT30E/IQ9UTeAF5YFXdjJMMfma6g+Gf/EAKMBEncQIcnvx6xYAfDXJZ
      |8EZM5ACzqi5EK4/lS05MlMHHAwHR1lfMew+a60I/FnoiVbOy6MvugkF2+y5MdWzA
      |f3lyfBGZh52cU+NgPKd8kMbLlRrHjVI79FuCFEh5OinfZZ1yddj8I4XPii9KrNtt
      |ElhrsB1q1GLr95UtkuuEBjY3uh53+LbqO/L4g12zrZfoAX7h1FeOwlHIf0TGFi9h
      |5iN3V37WitDgExGF4riiaQrDWG+cy/qJEeJ2gBZHYbCmlsdg3NLCkzNmSPEQx8W/
      |tWgoFyhOs3hKO0cl67+2zEQNpv84f1Y=
      |-----END CERTIFICATE-----""".stripMargin

  private val relayPem =
    """-----BEGIN CERTIFICATE-----
      |MIIDSTCCAjGgAwIBAgIUVZAWvSwQfdhoJ9u9UPhm2mg+HlUwDQYJKoZIhvcNAQEL
      |BQAwNDERMA8GA1UEAwwIcmVsYXktbmExEjAQBgNVBAoMCUdyYWZ0TWVzaDELMAkG
      |A1UEBhMCVVMwHhcNMjYwODEzMjMxODUwWhcNMzYwODEwMjMxODUwWjA0MREwDwYD
      |VQQDDAhyZWxheS1uYTESMBAGA1UECgwJR3JhZnRNZXNoMQswCQYDVQQGEwJVUzCC
      |ASIwDQYJKoZIhvcNAQEBBQADggEPADCCAQoCggEBALx9SWllx3LVtMiWV4iRr86/
      |m4RXWn2w6PwtIViYOBveOlEvbVvMBjapIfMjNFezIkmSo/ULRWGRE/keXeQCcMtn
      |sczaUqo+H5KICYibR0xsuG7mU19LZCQ3x8124F6sRjS/GBlAv7KgPceog3BWZbiy
      |6nnMoCLqc2k+abWrCUYGVkHr8HpX/d0E3WeDLACVZ1v0fHpIo7wtxFJgUSL3oUU9
      |kTjuNEzGZImVa54YHg1WPiNRPnSwWbLQ4jJTgj54Q9g5NoJT8PJ3lrs7qCkfW6/A
      |ADdF6l7u30ZniolHXXJFm+GdyMZdY1Wt4PnsRPQsy4ospdu2Dj+u1ylfYUk7lYsC
      |AwEAAaNTMFEwHQYDVR0OBBYEFCsBpE+V7XF1QLvpU43SsYM3WcCyMB8GA1UdIwQY
      |MBaAFCsBpE+V7XF1QLvpU43SsYM3WcCyMA8GA1UdEwEB/wQFMAMBAf8wDQYJKoZI
      |hvcNAQELBQADggEBAD4rUhWBETM7B630XHq1z4nlqQmsMqNlHgnm6k0kykA2/oSM
      |GS7zgDharsMYZ8jUGdbwutiYumMInWovjIOM8lRzYXIudvBjlChRbjgA/N4xnPPe
      |Q+7nbDS5DKGuojOTwH9OGvUgH68iMnb42hU9HfkLGgLr8ZbjJGUahkt5hm/uqOlG
      |OmLKqh25eSURE9A4KhQ+gkRxomdr3rVknTMVlXtS9Q400/b62PhQ/CBIzLFSix8c
      |gx4WtK8/nkxwWWTyan6RGgnSYQWjAW5sand2fTAi18wC9LjLUMG+4SGrrTGl8GCL
      |x9nj1iFHNjzScmMpDg00XwaTiRtNDRFBT8j5a/0=
      |-----END CERTIFICATE-----""".stripMargin

  // openssl x509 -fingerprint -sha256 outputs, colons stripped
  private val aliceFp =
    "F8564ABA2356632268A46990B06A4014D841073508E2BB0D65E1E81B3D6CE9FD"
  private val relayFp =
    "B6482CFCDA5E3E30D3BBCC9E942BB1B1221B433F0D3D27ED1865571AA3B8122D"

  test("fingerprint and DNs match openssl's parse of the same cert") {
    val p = Principal.fromPem(alicePem)
    assert(p.x509Sha256 == aliceFp)
    assert(p.x509Subject.contains("CN=alice") && p.x509Subject.contains("O=GraftTest"))
    assert(p.x509Issuer.contains("CN=alice")) // self-signed
    assert(!p.attributes.isAdmin)
    val r = Principal.fromPem(relayPem)
    assert(r.x509Sha256 == relayFp)
    assert(r.x509Subject.contains("CN=relay-na"))
  }

  test("upsert auto-registers unknown fingerprints and preserves stored attributes") {
    val reg = new PrincipalRegistry
    val p = Principal.fromPem(alicePem)
    assert(reg.get(aliceFp).isEmpty)
    reg.upsert(p)
    assert(reg.get(aliceFp).contains(p))
    // an admin grant survives the next upsert (deviation from the
    // reference's attribute-resetting do_update, documented in the source)
    reg.register(p.copy(attributes = PrincipalAttributes(isAdmin = true)))
    val again = reg.upsert(Principal(aliceFp, p.x509Subject, p.x509Issuer))
    assert(again.attributes.isAdmin)
  }

  test("attribute mutation requires an admin principal") {
    val reg = new PrincipalRegistry
    val alice = reg.upsert(Principal.fromPem(alicePem))
    val err = intercept[IllegalArgumentException] {
      reg.setAttributes(alice, aliceFp, PrincipalAttributes(isAdmin = true))
    }
    assert(err.getMessage.contains("is not an admin"))
    val root = reg.register(Principal("ROOTFP", "CN=root", "CN=root",
      PrincipalAttributes(isAdmin = true)))
    val updated = reg.setAttributes(root, aliceFp,
      PrincipalAttributes(misc = Map("team" -> "data")))
    assert(updated.attributes.misc == Map("team" -> "data"))
  }

  test("origination: all-or-none fields, exact error otherwise") {
    val reg = new PrincipalRegistry
    val err = intercept[IllegalArgumentException] {
      reg.verifyOrigination(aliceFp, "CN=alice", "CN=alice",
        Origination(requestUuid = Some("u1")))
    }
    assert(err.getMessage ==
      "invalid query request: either all of requesting_user, " +
        "originating_relay, originating_task_id, and request_uuid " +
        "should be set or none!")
    // none set: direct user, auto-registered
    val direct = reg.verifyOrigination(aliceFp, "CN=alice", "CN=alice", Origination())
    assert(direct == UserRequester(reg.get(aliceFp).get))
  }

  test("forwarded requests from an unknown fingerprint are rejected; trusted relays classify") {
    val reg = new PrincipalRegistry
    val full = Origination(Some("na"), Some(aliceFp), Some("uuid-1"), Some("task-1"))
    val err = intercept[IllegalArgumentException] {
      reg.verifyOrigination(relayFp, "CN=relay-na", "CN=relay-na", full)
    }
    assert(err.getMessage.contains(
      s"Rejecting query request from unrecognized relay with fingerprint $relayFp"))
    reg.registerRelay(relayFp, "na")
    assert(reg.verifyOrigination(relayFp, "CN=relay-na", "CN=relay-na", full) ==
      RelayRequester("na", relayFp))
  }

  test("fingerprint-keyed ACLs enforce through a mesh query (sqlAs)") {
    graft.mesh.Fixtures.registerRaw(spark, TestSessions.sfDir)
    val alice = Principal.fromPem(alicePem)
    val allCols = Set("doc_id", "text", "lang", "source", "n_chars")
    val src = DataSource(
      id = "docs_cert_acl",
      sourceSql = "SELECT * FROM raw_documents",
      mappings = graft.mesh.Fixtures.documentsEntity.informations
        .map(i => FieldMapping(i.name, i.name)),
      // default: no source column, no zh rows; alice's CERT FINGERPRINT
      // unlocks everything — the reference's users.x509_sha256 join
      defaultPermission = SourcePermission(allCols - "source", "lang <> 'zh'"),
      userPermissions = Map(alice.userKey -> SourcePermission(allCols, "true")))
    val mesh = Mesh(Map("global" -> Site("global",
      entities = Map("documents" -> graft.mesh.Fixtures.documentsEntity),
      localSources = Map("documents" -> Seq(src)))))
    val session = new MeshSession(spark, mesh, "global")
    val asAlice = session.sqlAs(alice,
      "SELECT doc_id, lang, source FROM documents")
    val anon = session.sql("SELECT doc_id, lang, source FROM documents")
    // alice sees zh rows and real source values; anonymous gets the
    // default policy (zh hidden, source null-padded)
    assert(asAlice.where(col("lang") === "zh").count() > 0)
    assert(asAlice.where(col("source").isNotNull).count() > 0)
    assert(anon.where(col("lang") === "zh").count() == 0)
    assert(anon.where(col("source").isNotNull).count() == 0)
  }
}
