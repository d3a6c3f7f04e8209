package graft.engine

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/** SCRAM-SHA-256 server-side exchange (RFC 5802 framing, RFC 7677
  * hash suite) — the password handshake modern Postgres defaults to
  * and every pg client (psql, JDBC, psycopg) speaks. The reference
  * serves trust-auth only (`csvb_engine/src/lib.rs:91-132` accepts
  * any startup); graft keeps trust as the default and offers SCRAM
  * as an opt-in (`--pg-password`) so even the loopback-bound endpoint
  * ([[PgWire.Server]] binds the loopback address unconditionally)
  * isn't open to every local process. Note the socket stays
  * CLEARTEXT: SCRAM protects the credential exchange, not the query
  * or result traffic — exposing the endpoint beyond localhost would
  * additionally need TLS (out of scope) and a non-loopback bind.
  *
  * All crypto is JDK-only: PBKDF2WithHmacSHA256 for Hi(), HmacSHA256,
  * SHA-256 — no new dependencies. The exchange is factored as pure
  * functions of (password, salt, iterations, nonces) so the RFC 7677
  * test vector pins every intermediate value in ScramSpec; the socket
  * layer in [[PgWire]] only moves the three messages.
  *
  * Channel binding: only the no-CB gs2 flags are accepted (`n` — the
  * client doesn't do CB; `y` — it could but saw no SCRAM-...-PLUS
  * offer, which is truthful here since graft advertises SCRAM-SHA-256
  * alone over a cleartext socket). A `p=...` gs2 header is rejected:
  * there is no TLS channel to bind to.
  */
object Scram {

  val Mechanism = "SCRAM-SHA-256"
  val DefaultIterations = 4096

  private def hmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance("HmacSHA256")
    m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(msg)
  }

  private def sha256(bytes: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)

  /** Hi(str, salt, i) = PBKDF2-HMAC-SHA256 with dkLen = 32. The
    * password goes in as UTF-8; RFC 5802 calls for SASLprep but every
    * mainstream server accepts the byte-identity mapping for
    * passwords that are already normalized — non-ASCII passwords
    * should be pre-normalized by the operator.
    */
  def saltedPassword(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val f = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
    f.generateSecret(new javax.crypto.spec.PBEKeySpec(
      password.toCharArray, salt, iterations, 256)).getEncoded
  }

  def clientKey(saltedPw: Array[Byte]): Array[Byte] = hmac(saltedPw, "Client Key".getBytes(UTF_8))
  def storedKey(clientK: Array[Byte]): Array[Byte]  = sha256(clientK)
  def serverKey(saltedPw: Array[Byte]): Array[Byte] = hmac(saltedPw, "Server Key".getBytes(UTF_8))

  /** Parsed `client-first-message`: the gs2 header (verbatim, needed
    * again to check the client-final `c=` echo), the bare part
    * (needed for the AuthMessage), and the client nonce.
    */
  final case class ClientFirst(gs2Header: String, bare: String, clientNonce: String)

  /** Parse and validate a client-first-message. Throws
    * IllegalArgumentException on malformed input or an unusable gs2
    * header (channel binding requested, or authzid present).
    */
  def parseClientFirst(msg: String): ClientFirst = {
    // gs2-header = gs2-cbind-flag "," [ authzid ] ","
    val flagEnd = msg.indexOf(',')
    require(flagEnd >= 0, "malformed SCRAM client-first (no gs2 flag)")
    val flag = msg.substring(0, flagEnd)
    require(flag == "n" || flag == "y",
      s"unsupported gs2 channel-binding flag '$flag' (no TLS channel to bind)")
    val authzEnd = msg.indexOf(',', flagEnd + 1)
    require(authzEnd >= 0, "malformed SCRAM client-first (no authzid terminator)")
    require(authzEnd == flagEnd + 1, "SCRAM authzid is not supported")
    val gs2 = msg.substring(0, authzEnd + 1)
    val bare = msg.substring(authzEnd + 1)
    val attrs = parseAttrs(bare)
    require(!attrs.contains("m"), "SCRAM mandatory extensions are not supported")
    val nonce = attrs.getOrElse("r",
      throw new IllegalArgumentException("SCRAM client-first missing nonce"))
    require(nonce.nonEmpty && nonce.forall(c => c > ' ' && c <= '~' && c != ','),
      "SCRAM client nonce must be printable and comma-free")
    ClientFirst(gs2, bare, nonce)
  }

  /** `k=v` attribute list; values may contain '=' (base64 padding). */
  private def parseAttrs(s: String): Map[String, String] =
    s.split(",").iterator.filter(_.nonEmpty).map { kv =>
      require(kv.length >= 2 && kv.charAt(1) == '=', s"malformed SCRAM attribute '$kv'")
      kv.substring(0, 1) -> kv.substring(2)
    }.toMap

  def serverFirst(fullNonce: String, salt: Array[Byte], iterations: Int): String =
    s"r=$fullNonce,s=${Base64.getEncoder.encodeToString(salt)},i=$iterations"

  /** Verify a `client-final-message`. Returns the
    * `server-final-message` (`v=<ServerSignature>`) on success; None
    * on a bad proof (wrong password). Structural violations (nonce or
    * channel-binding echo mismatch) throw — those are protocol
    * errors, not wrong passwords.
    */
  def verifyClientFinal(clientFinal: String, cf: ClientFirst, srvFirst: String,
      fullNonce: String, saltedPw: Array[Byte]): Option[String] = {
    val attrs = parseAttrs(clientFinal)
    val c = attrs.getOrElse("c",
      throw new IllegalArgumentException("SCRAM client-final missing channel binding"))
    // c= is base64(gs2-header ++ cbind-data); with no channel binding
    // the cbind-data is empty, so it must echo exactly the gs2 header
    // from the client-first — a mismatch is a downgrade/tamper signal
    require(c == Base64.getEncoder.encodeToString(cf.gs2Header.getBytes(UTF_8)),
      "SCRAM channel-binding echo does not match the client-first gs2 header")
    val r = attrs.getOrElse("r",
      throw new IllegalArgumentException("SCRAM client-final missing nonce"))
    require(r == fullNonce, "SCRAM nonce mismatch in client-final")
    val p = attrs.getOrElse("p",
      throw new IllegalArgumentException("SCRAM client-final missing proof"))
    val proof = Base64.getDecoder.decode(p)
    require(proof.length == 32, "SCRAM client proof must be 32 bytes")
    val withoutProof = clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
    val authMessage = s"${cf.bare},$srvFirst,$withoutProof".getBytes(UTF_8)
    val ck = clientKey(saltedPw)
    val sig = hmac(storedKey(ck), authMessage)
    // ClientProof = ClientKey XOR ClientSignature → recover ClientKey
    val recovered = proof.zip(sig).map { case (a, b) => (a ^ b).toByte }
    if (!java.security.MessageDigest.isEqual(sha256(recovered), storedKey(ck))) None
    else {
      val serverSig = hmac(serverKey(saltedPw), authMessage)
      Some(s"v=${Base64.getEncoder.encodeToString(serverSig)}")
    }
  }

  /** A fresh server nonce: 18 random bytes, base64 (24 printable
    * chars, no commas — base64's alphabet is comma-free by
    * construction).
    */
  def freshServerNonce(rng: java.security.SecureRandom): String = {
    val b = new Array[Byte](18)
    rng.nextBytes(b)
    Base64.getEncoder.encodeToString(b)
  }

  // ------------------------------------------------------------------
  // Client side — the [[graft.engine.PgClient]] mirror of the exchange
  // above, in the same pure-function style so the RFC 7677 vector pins
  // every intermediate value without a socket.
  // ------------------------------------------------------------------

  /** The no-channel-binding gs2 header every graft client sends. */
  val Gs2NoBinding = "n,,"

  /** `client-first-message-bare`; the username is left empty because
    * Postgres ignores SCRAM `n=` and authenticates the startup-packet
    * user (and SASLprep of arbitrary names is out of scope).
    */
  def clientFirstBare(clientNonce: String): String = s"n=,r=$clientNonce"

  final case class ServerFirst(fullNonce: String, salt: Array[Byte], iterations: Int)

  /** Parse and validate a `server-first-message`: the combined nonce
    * must EXTEND the client's (a replayed or foreign nonce is a
    * protocol error, not a wrong password), and the iteration count
    * is bounded so a hostile server can't turn PBKDF2 into a DoS.
    */
  def parseServerFirst(msg: String, clientNonce: String): ServerFirst = {
    val attrs = parseAttrs(msg)
    require(!attrs.contains("m"), "SCRAM mandatory extensions are not supported")
    val r = attrs.getOrElse("r",
      throw new IllegalArgumentException("SCRAM server-first missing nonce"))
    require(r.startsWith(clientNonce) && r.length > clientNonce.length,
      "SCRAM server nonce must extend the client nonce")
    val salt = Base64.getDecoder.decode(attrs.getOrElse("s",
      throw new IllegalArgumentException("SCRAM server-first missing salt")))
    require(salt.nonEmpty, "SCRAM salt must be non-empty")
    val i = attrs.getOrElse("i",
      throw new IllegalArgumentException("SCRAM server-first missing iterations")).toInt
    // PostgreSQL 16+ allows scram_iterations up to 2^31-1; a hardened
    // server legitimately runs well past the old 1M bound. 2^24 keeps
    // a hostile server from turning PBKDF2 into a DoS (~seconds of
    // client CPU at the ceiling) while accepting any sane real config.
    // A TRUSTED higher-iteration server stays reachable by raising
    // GRAFT_SCRAM_MAX_ITERATIONS (DoS posture is a deployment choice,
    // not a hard-coded wall).
    val ceiling = sys.env.get("GRAFT_SCRAM_MAX_ITERATIONS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(1 << 24)
    require(i >= 1 && i <= ceiling,
      s"unreasonable SCRAM iteration count $i (ceiling $ceiling; " +
        "raise GRAFT_SCRAM_MAX_ITERATIONS for a trusted high-iteration server)")
    ServerFirst(r, salt, i)
  }

  /** Build the `client-final-message` and the server signature the
    * client must later see in `server-final` (`v=...`) — computing
    * both from one AuthMessage keeps mutual authentication honest:
    * a server that doesn't know the password cannot produce the
    * signature this returns.
    */
  def clientFinalMessage(gs2Header: String, clientFirstBareMsg: String,
      serverFirstMsg: String, sf: ServerFirst, password: String): (String, String) = {
    val c = Base64.getEncoder.encodeToString(gs2Header.getBytes(UTF_8))
    val withoutProof = s"c=$c,r=${sf.fullNonce}"
    val authMessage = s"$clientFirstBareMsg,$serverFirstMsg,$withoutProof".getBytes(UTF_8)
    val sp = saltedPassword(password, sf.salt, sf.iterations)
    val ck = clientKey(sp)
    val sig = hmac(storedKey(ck), authMessage)
    val proof = ck.zip(sig).map { case (a, b) => (a ^ b).toByte }
    val serverSig = hmac(serverKey(sp), authMessage)
    (s"$withoutProof,p=${Base64.getEncoder.encodeToString(proof)}",
      s"v=${Base64.getEncoder.encodeToString(serverSig)}")
  }

  /** Check the `server-final-message` against the signature
    * [[clientFinalMessage]] predicted (`expected` is `v=<sig>`).
    * RFC 5802 allows the server-final to carry an `e=` error
    * attribute INSTEAD of `v=` (surfaced as the server's own auth
    * error, not a signature mismatch) and optional extensions after
    * `v=` — so the attributes are parsed and only the signature is
    * compared, constant-time.
    */
  def verifyServerFinal(serverFinal: String, expected: String): Boolean = {
    val attrs = parseAttrs(serverFinal)
    attrs.get("e").foreach(e =>
      throw new RuntimeException(s"SCRAM server reported authentication error: $e"))
    val v = attrs.getOrElse("v", return false)
    val expectedSig = expected.stripPrefix("v=")
    java.security.MessageDigest.isEqual(v.getBytes(UTF_8), expectedSig.getBytes(UTF_8))
  }

  /** A fresh client nonce — same construction as the server's. */
  def freshClientNonce(rng: java.security.SecureRandom): String = freshServerNonce(rng)
}
