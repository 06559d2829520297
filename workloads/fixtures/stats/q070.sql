SELECT COUNT(*) FROM users as u, badges as b, comments as c WHERE b.UserId = u.Id AND c.UserId = u.Id AND u.Reputation>=500 AND b.Date>='2014-09-16 12:12:50'::timestamp;
