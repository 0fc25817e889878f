package graft.catalog

/** Principal model: who is asking.
  *
  * Mirrors the reference's user identity contract
  * (`core/src/model/user.rs:17-40`, `core/src/pki/mod.rs:10-24`): any
  * actor presents an x509 client certificate; its IDENTITY is the SHA-256
  * fingerprint of the DER-encoded certificate (uppercase hex, the
  * reference's `format!("{:X}")`), carried with the subject and issuer
  * distinguished names and an arbitrary attribute map used for access
  * decisions (`is_admin` gates config mutation — the /admin surface).
  * Permissions are keyed by fingerprint (`core/src/crud/user.rs:61-79`
  * joins `users.x509_sha256`), so a [[Principal]]'s `userKey` plugs
  * directly into the existing `DataSource.userPermissions` map.
  */
final case class PrincipalAttributes(
    isAdmin: Boolean = false,
    misc: Map[String, String] = Map.empty)

final case class Principal(
    x509Sha256: String,
    x509Subject: String,
    x509Issuer: String,
    attributes: PrincipalAttributes = PrincipalAttributes()) {
  /** The key into `DataSource.userPermissions` / registry state. */
  def userKey: String = x509Sha256
}

object Principal {

  /** Uppercase-hex SHA-256 of the DER bytes — byte-compatible with the
    * reference's fingerprint (`pki/mod.rs:13-15`). */
  def fingerprint(der: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(der).map("%02X".format(_)).mkString

  /** Parse a DER-encoded certificate into an unattributed principal. */
  def fromDer(der: Array[Byte]): Principal = {
    val cert = java.security.cert.CertificateFactory.getInstance("X.509")
      .generateCertificate(new java.io.ByteArrayInputStream(der))
      .asInstanceOf[java.security.cert.X509Certificate]
    Principal(
      x509Sha256 = fingerprint(der),
      x509Subject = cert.getSubjectX500Principal.getName(
        javax.security.auth.x500.X500Principal.RFC1779),
      x509Issuer = cert.getIssuerX500Principal.getName(
        javax.security.auth.x500.X500Principal.RFC1779))
  }

  /** Parse the first CERTIFICATE block of a PEM string. */
  def fromPem(pem: String): Principal = {
    val b64 = pem.linesIterator
      .dropWhile(!_.contains("BEGIN CERTIFICATE")).drop(1)
      .takeWhile(!_.contains("END CERTIFICATE"))
      .mkString
    require(b64.nonEmpty, "no CERTIFICATE block found in PEM input")
    fromDer(java.util.Base64.getMimeDecoder.decode(b64))
  }
}

/** Requester classification: a request arrives either directly from a user
  * or forwarded by a trusted peer relay (`core/src/execute/utils.rs:59-124`). */
sealed trait Requester
final case class UserRequester(principal: Principal) extends Requester
final case class RelayRequester(site: String, fingerprint: String) extends Requester

/** The origination fields a forwarded query carries — all four set for a
  * relay hop, none for a direct user request (`model/query.rs` raw
  * request contract). */
final case class Origination(
    originatingRelay: Option[String] = None,
    requestingUser: Option[String] = None, // fingerprint of the origin user
    requestUuid: Option[String] = None,
    originatingTaskId: Option[String] = None)

/** In-process principal + trusted-relay registry with the reference's
  * upsert-by-fingerprint semantics (`core/src/crud/user.rs:13-28`).
  *
  * One deliberate deviation, documented: the reference's upsert
  * `.do_update().set(val)` would overwrite a registered user's attributes
  * with defaults on every direct request (resetting `is_admin` the moment
  * an admin runs a query). Here upsert refreshes subject/issuer but
  * PRESERVES stored attributes; attribute changes go through
  * [[setAttributes]], which — like the /admin endpoints — requires an
  * admin principal.
  */
final class PrincipalRegistry {
  private val users =
    scala.collection.concurrent.TrieMap.empty[String, Principal]
  private val relays =
    scala.collection.concurrent.TrieMap.empty[String, String] // fp -> site

  /** Insert-or-refresh by fingerprint; stored attributes win. */
  def upsert(p: Principal): Principal = {
    val merged = users.get(p.x509Sha256) match {
      case Some(existing) => p.copy(attributes = existing.attributes)
      case None => p
    }
    users.put(p.x509Sha256, merged)
    merged
  }

  def get(fingerprint: String): Option[Principal] = users.get(fingerprint)

  /** Attribute mutation is the /admin surface: caller must be an admin
    * already known to this registry. */
  def setAttributes(
      by: Principal, fingerprint: String, attrs: PrincipalAttributes): Principal = {
    val caller = users.get(by.x509Sha256)
    require(caller.exists(_.attributes.isAdmin),
      s"principal ${by.x509Sha256} is not an admin: attribute changes " +
        "require is_admin (the reference's /admin endpoint gate)")
    val cur = users.getOrElse(fingerprint,
      throw new NoSuchElementException(s"no principal $fingerprint"))
    val updated = cur.copy(attributes = attrs)
    users.put(fingerprint, updated)
    updated
  }

  /** Bootstrap/config path (relay startup trust config, not the /admin
    * surface): register a principal verbatim, attributes included. */
  def register(p: Principal): Principal = { users.put(p.x509Sha256, p); p }

  def registerRelay(fingerprint: String, site: String): Unit =
    relays.put(fingerprint, site): Unit

  def relayFor(fingerprint: String): Option[String] = relays.get(fingerprint)

  /** The reference's `verify_query_origination_information`
    * (`core/src/execute/utils.rs:59-124`): classify the requester from the
    * presented client fingerprint + the request's origination fields.
    *
    *  - all four origination fields set: the direct client must be a
    *    TRUSTED RELAY fingerprint, else the request is rejected;
    *  - none set: a direct user request — the user is auto-registered
    *    (upserted) by fingerprint with default attributes;
    *  - anything in between: the exact invalid-query error.
    */
  def verifyOrigination(
      clientFingerprint: String,
      clientSubject: String,
      clientIssuer: String,
      orig: Origination): Requester = {
    val fields = Seq(orig.originatingRelay, orig.requestingUser,
      orig.requestUuid, orig.originatingTaskId)
    if (fields.forall(_.isDefined)) {
      relayFor(clientFingerprint) match {
        case Some(site) => RelayRequester(site, clientFingerprint)
        case None => throw new IllegalArgumentException(
          s"Rejecting query request from unrecognized relay with " +
            s"fingerprint $clientFingerprint and dn: $clientSubject")
      }
    } else if (fields.forall(_.isEmpty)) {
      UserRequester(upsert(
        Principal(clientFingerprint, clientSubject, clientIssuer)))
    } else {
      throw new IllegalArgumentException(
        "invalid query request: either all of requesting_user, " +
          "originating_relay, originating_task_id, and request_uuid " +
          "should be set or none!")
    }
  }
}
