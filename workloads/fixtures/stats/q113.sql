SELECT COUNT(*) FROM users as u, badges as b, comments as c WHERE b.UserId = u.Id AND c.UserId = u.Id AND u.DownVotes>=17 AND b.Date>='2013-11-19 20:06:23'::timestamp;
