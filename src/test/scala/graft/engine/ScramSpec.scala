package graft.engine

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

/** Pins the SCRAM-SHA-256 math to the RFC 7677 §3 test vector — every
  * intermediate (salted password, server-first, server signature) is
  * the published value, so a regression in any crypto step fails
  * against the RFC itself — plus structural rejection cases and a
  * generative "honest client verifies" law. The socket flow is proven
  * separately by PgWireSpec's stock-psql SCRAM login.
  */
class ScramSpec extends AnyFunSuite {

  // RFC 7677 §3 test vector
  private val Pass = "pencil"
  private val ClientFirstMsg = "n,,n=user,r=rOprNGfwEbeRWgbNEkqO"
  private val FullNonce = "rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"
  private val Salt = Base64.getDecoder.decode("W22ZaJ0SNY7soEsUEjb6gQ==")
  private val Iters = 4096
  private val ClientFinalMsg =
    "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
  private val ServerFinalMsg = "v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="

  test("RFC 7677 test vector: full exchange verifies and yields the published ServerSignature") {
    val cf = Scram.parseClientFirst(ClientFirstMsg)
    assert(cf.gs2Header === "n,,")
    assert(cf.bare === "n=user,r=rOprNGfwEbeRWgbNEkqO")
    assert(cf.clientNonce === "rOprNGfwEbeRWgbNEkqO")
    val srvFirst = Scram.serverFirst(FullNonce, Salt, Iters)
    assert(srvFirst === s"r=$FullNonce,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096")
    val saltedPw = Scram.saltedPassword(Pass, Salt, Iters)
    assert(Scram.verifyClientFinal(ClientFinalMsg, cf, srvFirst, FullNonce, saltedPw)
      === Some(ServerFinalMsg))
  }

  test("wrong password: proof rejects (None), no exception — callers map it to 28P01") {
    val cf = Scram.parseClientFirst(ClientFirstMsg)
    val srvFirst = Scram.serverFirst(FullNonce, Salt, Iters)
    val wrongPw = Scram.saltedPassword("pencill", Salt, Iters)
    assert(Scram.verifyClientFinal(ClientFinalMsg, cf, srvFirst, FullNonce, wrongPw).isEmpty)
  }

  test("structural violations throw: nonce mismatch, channel-binding echo mismatch, missing proof") {
    val cf = Scram.parseClientFirst(ClientFirstMsg)
    val srvFirst = Scram.serverFirst(FullNonce, Salt, Iters)
    val saltedPw = Scram.saltedPassword(Pass, Salt, Iters)
    // tampered nonce in client-final
    intercept[IllegalArgumentException] {
      Scram.verifyClientFinal(ClientFinalMsg.replace("k0,p=", "kX,p="),
        cf, srvFirst, FullNonce, saltedPw)
    }
    // c= says "y,," (eSws) while the client-first said "n,," — downgrade signal
    intercept[IllegalArgumentException] {
      Scram.verifyClientFinal(ClientFinalMsg.replace("c=biws", "c=eSws"),
        cf, srvFirst, FullNonce, saltedPw)
    }
    intercept[IllegalArgumentException] {
      Scram.verifyClientFinal(s"c=biws,r=$FullNonce", cf, srvFirst, FullNonce, saltedPw)
    }
  }

  test("gs2 flags: 'y' accepted, channel-binding 'p=' and authzid rejected") {
    assert(Scram.parseClientFirst("y,,n=user,r=abc").gs2Header === "y,,")
    intercept[IllegalArgumentException] {
      Scram.parseClientFirst("p=tls-server-end-point,,n=user,r=abc")
    }
    intercept[IllegalArgumentException] {
      Scram.parseClientFirst("n,a=admin,n=user,r=abc")
    }
    intercept[IllegalArgumentException] { // mandatory extension
      Scram.parseClientFirst("n,,m=ext,n=user,r=abc")
    }
  }

  test("law: an honest client with the right password verifies for generated inputs") {
    val rng = new java.security.SecureRandom(Array[Byte](42)) // deterministic seed
    def hmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
      val m = javax.crypto.Mac.getInstance("HmacSHA256")
      m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
      m.doFinal(msg)
    }
    (1 to 20).foreach { i =>
      val pw = s"pw-$i-${rng.nextLong()}"
      val salt = new Array[Byte](16); rng.nextBytes(salt)
      val cNonce = Scram.freshServerNonce(rng) // any comma-free printable works
      val clientFirst = s"n,,n=u,r=$cNonce"
      val cf = Scram.parseClientFirst(clientFirst)
      val full = cNonce + Scram.freshServerNonce(rng)
      val srvFirst = Scram.serverFirst(full, salt, 4096)
      val saltedPw = Scram.saltedPassword(pw, salt, 4096)
      // client-side computation per RFC 5802
      val withoutProof = s"c=biws,r=$full"
      val authMsg = s"${cf.bare},$srvFirst,$withoutProof".getBytes(UTF_8)
      val ck = Scram.clientKey(saltedPw)
      val sig = hmac(Scram.storedKey(ck), authMsg)
      val proof = ck.zip(sig).map { case (a, b) => (a ^ b).toByte }
      val clientFinal = s"$withoutProof,p=${Base64.getEncoder.encodeToString(proof)}"
      assert(Scram.verifyClientFinal(clientFinal, cf, srvFirst, full, saltedPw).isDefined,
        s"seed $i")
    }
  }

  test("client side: RFC 7677 vector reproduces the published client-final and server signature") {
    val srvFirstMsg = s"r=$FullNonce,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    val sf = Scram.parseServerFirst(srvFirstMsg, "rOprNGfwEbeRWgbNEkqO")
    assert(sf.fullNonce === FullNonce)
    assert(sf.iterations === Iters)
    assert(java.util.Arrays.equals(sf.salt, Salt))
    val (clientFinal, expectV) = Scram.clientFinalMessage(
      "n,,", "n=user,r=rOprNGfwEbeRWgbNEkqO", srvFirstMsg, sf, Pass)
    assert(clientFinal === ClientFinalMsg)
    assert(expectV === ServerFinalMsg)
    assert(Scram.verifyServerFinal(ServerFinalMsg, expectV))
    assert(!Scram.verifyServerFinal("v=QUFBQQ==", expectV))
    // RFC 5802: optional extensions after v= must not break the match
    assert(Scram.verifyServerFinal(s"$ServerFinalMsg,x=future-ext", expectV))
    // an e= attribute is the SERVER's auth error, not a sig mismatch
    val e = intercept[RuntimeException](
      Scram.verifyServerFinal("e=invalid-proof", expectV))
    assert(e.getMessage.contains("invalid-proof"))
  }

  test("client side: hardened-server iteration counts accepted up to the DoS ceiling") {
    // PostgreSQL 16+ scram_iterations can exceed the old 1M bound
    val sf = Scram.parseServerFirst(
      s"r=mineXYZ,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=${1 << 24}", "mine")
    assert(sf.iterations === (1 << 24))
    intercept[IllegalArgumentException](Scram.parseServerFirst(
      s"r=mineXYZ,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=${(1 << 24) + 1}", "mine"))
  }

  test("client side: server-first structural rejections") {
    // a nonce that does not EXTEND the client's is a replay/foreign signal
    intercept[IllegalArgumentException](
      Scram.parseServerFirst("r=somebodyElse,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096", "mine"))
    // the nonce must strictly extend (server must append entropy)
    intercept[IllegalArgumentException](
      Scram.parseServerFirst("r=mine,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096", "mine"))
    intercept[IllegalArgumentException](
      Scram.parseServerFirst("r=mineXYZ,i=4096", "mine")) // no salt
    // a hostile server cannot drive PBKDF2 cost unbounded
    intercept[IllegalArgumentException](
      Scram.parseServerFirst("r=mineXYZ,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=99999999", "mine"))
  }

  test("client and server halves complete a full mutual exchange for generated inputs") {
    val rng = new java.security.SecureRandom(Array[Byte](42))
    (1 to 10).foreach { i =>
      val pw = s"pw-$i"
      val cNonce = Scram.freshClientNonce(rng)
      val bare = Scram.clientFirstBare(cNonce)
      val cf = Scram.parseClientFirst(Scram.Gs2NoBinding + bare)
      val salt = new Array[Byte](16); rng.nextBytes(salt)
      val full = cf.clientNonce + Scram.freshServerNonce(rng)
      val srvFirst = Scram.serverFirst(full, salt, 4096)
      val sf = Scram.parseServerFirst(srvFirst, cNonce)
      val (clientFinal, expectV) = Scram.clientFinalMessage(
        Scram.Gs2NoBinding, bare, srvFirst, sf, pw)
      val saltedPw = Scram.saltedPassword(pw, salt, 4096)
      val serverFinal = Scram.verifyClientFinal(clientFinal, cf, srvFirst, full, saltedPw)
      assert(serverFinal === Some(expectV), s"round $i") // mutual auth closes
      // and the wrong password fails on the server side
      val wrongSalted = Scram.saltedPassword(pw + "!", salt, 4096)
      assert(Scram.verifyClientFinal(clientFinal, cf, srvFirst, full, wrongSalted).isEmpty)
    }
  }
}
